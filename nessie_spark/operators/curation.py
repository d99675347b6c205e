"""Training-data curation operators (task brief §training-data pipeline):
sequence packing and stratified mixing over the ``documents`` table.

These are the two batch-assembly steps between "cleaned corpus" and
"training batches" that every large-scale LLM data pipeline runs after the
dedup/quality stages this engine already ships:

- **sequence packing** — concatenate documents into fixed token-budget
  training sequences (the GPT-style concat-then-split layout);
- **stratified sampling / mixing** — apply per-stratum keep rates so the
  training mixture over-represents high-value strata, deterministically
  (re-runs pick the same documents, so the mixture is reproducible and
  resumable).

Both are pure Catalyst expressions + one window per shard — no UDFs, no
driver state — and both carry exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nessie_spark.functions.core import h64
from nessie_spark.operators.common import T, h64_sql

PACK_BUDGET = 512  # whitespace tokens per training sequence

# Whitespace-token count in the engine-wide explicit-class dialect
# (identical in Java regex / RE2 / Python — see token_counts). A function:
# Column construction needs an active session, so no module-level Columns.
def _ws_tokens():
    return F.size(F.split(F.trim("text"), r"[ \t\n\f\r]+"))


_WS_TOKENS_SQL = "len(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+'))"


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training sequences
    (budget = 512 whitespace tokens): within each shard, documents are
    concatenated in doc_id order and the stream is split every BUDGET
    tokens; a document belongs to the sequence its first token lands in
    (the standard concat-then-split training layout — documents may
    straddle a boundary, and the straddler is attributed to the sequence
    it starts in).

    Shard = ``lang`` here; the production shard is ``h64(doc_id) % P``
    for P ≫ executors. Packing is one cumulative-sum window PER SHARD —
    contiguity (and therefore the sort) is only required within a shard,
    so the job is embarrassingly parallel across shards at 100 TB: no
    global order, no driver state, ~(rows) through one hash exchange.

    Output per document: its sequence id, token offset inside the
    sequence, and token count — integer-exact in both engines."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    w = Window.partitionBy("lang").orderBy("doc_id")
    toks = docs.select("doc_id", "lang", _ws_tokens().cast("long").alias("n_tokens"))
    packed = toks.withColumn(
        "_start",
        F.coalesce(F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                   F.lit(0).cast("long")),
    )
    return packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(F.col("_start") / PACK_BUDGET).cast("long").alias("seq_id"),
        (F.col("_start") % PACK_BUDGET).cast("long").alias("seq_offset"),
    ).orderBy("doc_id")


DOC_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, CAST({_WS_TOKENS_SQL} AS BIGINT) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS _start
  FROM toks
)
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR(_start / {PACK_BUDGET}) AS BIGINT) AS seq_id,
       CAST(_start % {PACK_BUDGET} AS BIGINT) AS seq_offset
FROM packed ORDER BY doc_id
"""


# Per-stratum keep rates (percent): the training-mixture policy. Strata are
# token-length buckets here; production swaps in the model-based quality
# column — the machinery (deterministic per-row hash threshold) is the op.
MIX_RATES = {"long": 100, "mid": 50, "short": 10}
_LONG_MIN, _MID_MIN = 60, 20


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling / dataset mixing: each document
    falls into a stratum (token-length bucket per ``lang``) and is kept
    when ``h64('mix|' + doc_id) % 100`` clears the stratum's keep rate —
    long docs keep 100%, mid 50%, short 10%.

    The hash threshold makes the mixture a pure per-row predicate: no
    shuffle, no sampling state, identical output on re-run/backfill (the
    property reservoir- or rand()-based sampling lacks — Spark may
    re-execute tasks, so nondeterministic sampling double- or drop-counts
    rows). Changing a stratum's rate from p to q < p keeps a SUBSET of the
    previously kept rows (the threshold only tightens), so mixtures are
    monotonically refinable across training runs."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    bucket = (
        F.when(_ws_tokens() >= _LONG_MIN, F.lit("long"))
        .when(_ws_tokens() >= _MID_MIN, F.lit("mid"))
        .otherwise(F.lit("short"))
    )
    rate = F.when(F.col("bucket") == "long", F.lit(MIX_RATES["long"])).when(
        F.col("bucket") == "mid", F.lit(MIX_RATES["mid"])
    ).otherwise(F.lit(MIX_RATES["short"]))
    draw = F.pmod(h64(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), F.lit(100))
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .withColumn("keep", (draw < rate))
        .where(F.col("keep"))
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         CASE WHEN {_WS_TOKENS_SQL} >= {_LONG_MIN} THEN 'long'
              WHEN {_WS_TOKENS_SQL} >= {_MID_MIN} THEN 'mid'
              ELSE 'short' END AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket
FROM d
WHERE ({h64_sql(x="'mix|' || CAST(doc_id AS VARCHAR)")}) % 100 <
      CASE bucket WHEN 'long' THEN {MIX_RATES["long"]}
                  WHEN 'mid' THEN {MIX_RATES["mid"]}
                  ELSE {MIX_RATES["short"]} END
ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "doc_pack_sequences": (doc_pack_sequences, DOC_PACK_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
}

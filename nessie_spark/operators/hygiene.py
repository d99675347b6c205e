"""Training-data hygiene: benchmark-contamination detection + PII scrub.

Two first-class LLM-pipeline operators over ``documents`` (task brief:
"the operations a large-scale training-data pipeline would need"):

- ``contamination_report``: word-n-gram overlap of every candidate
  training document against a benchmark split — the standard
  decontamination check run before pretraining (e.g. GPT-3 appendix C /
  PaLM-style 8-gram overlap; here n=5 to fit the synthetic corpus's short
  docs). ``source == 'src0'`` plays the benchmark split.
- ``pii_scrub``: deterministic regex redaction (emails, IPv4, SSN-shaped
  ids) with per-doc redaction counts. Patterns are restricted to the
  Java-regex ∩ RE2 common dialect so the Spark plan and the DuckDB oracle
  are provably computing the same function; the unit test plants true
  positives (the synthetic corpus itself is PII-free, so the oracle run
  doubles as a no-false-positives check).

Scale shapes: contamination is one Arrow-batched n-gram pass + one join
on the gram key — benchmark sets are tiny relative to training corpora,
so the gram set broadcasts (at 100 TB: a few GB of benchmark grams vs TBs
of candidates; if the benchmark side ever outgrows broadcast, drop the
hint and the same plan shuffle-joins on ``gram``). PII scrub is pure
per-row JVM regex inside whole-stage codegen — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nessie_spark.operators.common import T

N_GRAM = 5
BENCH_SOURCE = "src0"

_PII_PATTERNS = [
    # (tag, pattern) — Java ∩ RE2 dialect only: no lookaround, no backrefs
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("<SSN>", r"\b\d{3}-\d{2}-\d{4}\b"),
]


def _doc_grams(df: DataFrame) -> DataFrame:
    """Distinct word-N_GRAM set per document, one Arrow-batched pass
    (HOF slice/array_join chains run interpreted — same lesson as
    variation_ngrams_multi)."""

    def gen(batches):
        import re

        import pandas as pd

        # ASCII \s and space-only strip: the exact dialect of the DuckDB
        # twin (RE2 \s is ASCII; trim() trims spaces) — Unicode Python
        # semantics would silently shift every gram on a doc with a
        # leading tab or NBSP
        ws = re.compile(r"[ \t\n\f\r]+")  # explicit Java∩RE2∩Python class
        for pdf in batches:
            ids, srcs, grams = [], [], []
            for d, s, tx in zip(pdf["doc_id"], pdf["source"], pdf["text"]):
                ts = ws.split(tx.strip(" ").lower()) if tx and tx.strip(" ") else []
                seen = set()
                for i in range(len(ts) - N_GRAM + 1):
                    seen.add(" ".join(ts[i : i + N_GRAM]))
                ids.extend([d] * len(seen))
                srcs.extend([s] * len(seen))
                grams.extend(seen)
            yield pd.DataFrame({"doc_id": ids, "source": srcs, "gram": grams})

    return df.select("doc_id", "source", "text").mapInPandas(
        gen, schema="doc_id long, source string, gram string"
    )


def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training doc: distinct-5-gram count, how many also occur in the
    benchmark split, overlap fraction, contaminated = overlap ≥ 0.5.
    Docs shorter than N_GRAM tokens have no grams and no row (consistent
    with the oracle)."""
    from nessie_spark.operators.dedup import _spread

    docs = _spread(spark, T(spark, sf_dir, "documents"))
    # split BEFORE tokenizing: each doc is gram-enumerated exactly once
    # (one logical corpus pass split across the two subplans) — deriving
    # both sides from one _doc_grams DataFrame re-executed the full-corpus
    # Arrow pass twice, since Spark cannot push the source filter below
    # mapInPandas or dedupe non-exchange subtrees
    bench = (
        _doc_grams(docs.where(F.col("source") == BENCH_SOURCE))
        .select("gram").distinct()
        .withColumn("hit", F.lit(1))
    )
    train = _doc_grams(docs.where(F.col("source") != BENCH_SOURCE))
    return (
        train.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_overlap"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            "n_overlap",
            F.round(F.col("n_overlap").cast("double") / F.col("n_grams"), 6).alias(
                "overlap_frac"
            ),
            (F.col("n_overlap") * 2 >= F.col("n_grams")).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


CONTAMINATION_SQL = f"""
WITH toks AS (
    SELECT doc_id, source,
           regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS ts
    FROM documents
    WHERE trim(text) <> ''
), grams AS (
    SELECT DISTINCT doc_id, source, gram
    FROM (
        SELECT doc_id, source,
               unnest(list_transform(
                   generate_series(1, greatest(len(ts) - {N_GRAM - 1}, 0)),
                   i -> array_to_string(ts[i:i + {N_GRAM - 1}], ' ')
               )) AS gram
        FROM toks
    )
), bench AS (
    SELECT DISTINCT gram FROM grams WHERE source = '{BENCH_SOURCE}'
)
SELECT g.doc_id,
       g.source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       ROUND(CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS overlap_frac,
       (SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) * 2 >= COUNT(*))
           AS contaminated
FROM grams g LEFT JOIN bench b USING (gram)
WHERE g.source <> '{BENCH_SOURCE}'
GROUP BY g.doc_id, g.source
ORDER BY g.doc_id
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / IPv4s / SSN-shaped ids; per-doc redaction count.
    All-JVM regexp inside codegen (no UDF). Counts are taken SEQUENTIALLY
    on the progressively-scrubbed text — exactly the matches the chained
    replacements actually apply. Counting every pattern on the original
    text disagrees in both directions: an email whose local part contains
    an SSN shape counts a phantom <SSN>, and a boundary created by an
    earlier substitution can surface a real match the original missed."""
    docs = T(spark, sf_dir, "documents")
    clean = F.col("text")
    n = F.lit(0).cast("long")
    for tag, pat in _PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0)))
        clean = F.regexp_replace(clean, pat, tag)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n.cast("long").alias("n_redactions"),
    ).orderBy("doc_id")


_PII_SQL_EXPR = "text"
_PII_N_EXPR = []
for _tag, _pat in _PII_PATTERNS:
    # counts mirror the engine: each pattern counted on the text AFTER the
    # previous replacements (sequential semantics)
    _PII_N_EXPR.append(f"len(regexp_extract_all({_PII_SQL_EXPR}, '{_pat}'))")
    _PII_SQL_EXPR = f"regexp_replace({_PII_SQL_EXPR}, '{_pat}', '{_tag}', 'g')"

PII_SCRUB_SQL = f"""
SELECT doc_id,
       {_PII_SQL_EXPR} AS clean_text,
       CAST({" + ".join(_PII_N_EXPR)} AS BIGINT) AS n_redactions
FROM documents
ORDER BY doc_id
"""

def contamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination: MinHash-LSH near-duplicate matching of every
    training document against the benchmark split, exact-Jaccard-verified
    — catches the paraphrased/reformatted benchmark leaks that exact
    n-gram overlap (``contamination_report``) misses. One row per
    contaminated training doc: its best-matching benchmark doc (max
    verified Jaccard, bench_id ascending as the tie-break).

    Scale shape: shingles + 32-family signatures are computed ONCE over
    the whole corpus (checkpointed — bench/train both read them), band
    keys ride the 8× explode without payloads (dedup.band_explode), and
    the candidate join BROADCASTS the benchmark side — benchmarks are
    a few MB of band keys against TBs of training docs, so no shuffle of
    the training corpus happens at all; the verify join touches only the
    candidate pairs. The banded candidate set is mirrored exactly in the
    oracle (same md5-derived hash family), so the gate checks the real
    banding algorithm, not an all-pairs idealization."""
    from nessie_spark.operators.dedup import (
        JACCARD_T,
        N_MINHASH,
        _mh_sigs,
        _shingles,
        _spread,
        band_explode,
    )
    from pyspark.sql.window import Window

    docs = _spread(spark, T(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id", "source", _shingles(F.col("text")).alias("sh")
    ).localCheckpoint(eager=True)
    sig = d.select(
        "doc_id", "source", _mh_sigs(F.col("sh"), N_MINHASH).alias("sig")
    )
    # checkpoint the exploded keys, not sig: banded feeds BOTH the
    # broadcast (bench) and probe (train) sides — uncheckpointed, the
    # 32-family minhash UDF executes twice over the full corpus
    banded = band_explode(sig, carry=("doc_id", "source")).localCheckpoint(
        eager=True
    )
    bench_b = banded.where(F.col("source") == BENCH_SOURCE).select(
        F.col("doc_id").alias("bench_id"), "band", "key"
    )
    train_b = banded.where(F.col("source") != BENCH_SOURCE).select(
        "doc_id", "band", "key"
    )
    cand = (
        train_b.join(F.broadcast(bench_b), ["band", "key"])
        .select("doc_id", "bench_id")
        .dropDuplicates(["doc_id", "bench_id"])
    )
    cand = cand.join(
        d.select("doc_id", F.col("sh").alias("sh_t")), "doc_id"
    ).join(
        d.select(F.col("doc_id").alias("bench_id"), F.col("sh").alias("sh_b")),
        "bench_id",
    )
    inter = F.size(F.array_intersect("sh_t", "sh_b"))
    union = F.size("sh_t") + F.size("sh_b") - inter
    verified = cand.select(
        "doc_id",
        "bench_id",
        F.round(inter.cast("double") / union, 6).alias("jaccard"),
    ).where(F.col("jaccard") >= JACCARD_T)
    w = Window.partitionBy("doc_id").orderBy(F.desc("jaccard"), F.asc("bench_id"))
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "bench_id", "jaccard")
        .orderBy("doc_id")
    )


def _contamination_fuzzy_sql() -> str:
    from nessie_spark.operators.dedup import (
        JACCARD_T,
        N_BANDS,
        _SHINGLES_SQL,
        _mh_band_keys_sql,
    )

    band_eq = " OR ".join(f"t.k{b} = b.k{b}" for b in range(N_BANDS))
    return f"""
WITH sh0 AS ({_SHINGLES_SQL}),
sh AS (SELECT s.doc_id, d.source, s.sh
       FROM sh0 s JOIN documents d USING (doc_id)),
banded AS (SELECT doc_id, source, sh, {_mh_band_keys_sql()} FROM sh),
cand AS (
  SELECT DISTINCT t.doc_id, b.doc_id AS bench_id, t.sh AS sh_t, b.sh AS sh_b
  FROM banded t JOIN banded b
    ON t.source <> '{BENCH_SOURCE}' AND b.source = '{BENCH_SOURCE}'
   AND ({band_eq})
), ver AS (
  SELECT doc_id, bench_id,
         ROUND(CAST(len(list_intersect(sh_t, sh_b)) AS DOUBLE)
               / (len(sh_t) + len(sh_b) - len(list_intersect(sh_t, sh_b))), 6)
           AS jaccard
  FROM cand
)
SELECT doc_id, bench_id, jaccard FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY jaccard DESC, bench_id) AS rn
  FROM ver WHERE jaccard >= {JACCARD_T}
) WHERE rn = 1 ORDER BY doc_id
"""


CONTAMINATION_FUZZY_SQL = _contamination_fuzzy_sql()


QUERIES = {
    "contamination_report": (contamination_report, CONTAMINATION_SQL),
    "contamination_fuzzy": (contamination_fuzzy, CONTAMINATION_FUZZY_SQL),
    "pii_scrub": (pii_scrub, PII_SCRUB_SQL),
}

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

Fixed-point caveat (applies to every op here that rounds a transcendental
— POWER/LN — to a BIGINT): JVM Math and libm agree to ≤1 ulp but are not
both correctly rounded, so an input landing within 1 ulp of a .5 rounding
boundary could flip the fixed-point value between engines. No fixture has
hit it (probability ~1e-16 per value); if the gate ever flakes on one of
these ops, widen the rounding epsilon rather than chasing a logic bug.
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


# Temperature-weighted domain mixing (the multilingual-pretraining classic:
# sample domain s with probability ∝ n_s^α, α<1 up-weights small domains).
MIX_ALPHA = 0.7          # temperature exponent
MIX_BUDGET_PCT = 50      # overall corpus budget: keep ~50% of N docs
_W_SCALE = 1_000_000     # fixed-point scale for the n_s^α weights


def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixture sampling: draw a ~50%-of-corpus
    budget across ``source`` domains with per-domain quotas ∝ n_s^0.7 —
    the exponentiated-count mixing rule large multilingual/multi-domain
    pretraining runs use to up-weight small domains without flattening the
    distribution. Deterministic: each domain keeps the q_s documents with
    the smallest h64('dmx|'+doc_id) (doc_id as tie-break), so re-runs and
    backfills pick the identical mixture.

    Integer-exact quota discipline for the cross-engine gate: weights are
    fixed-point ``round(n_s^α · 1e6)`` BIGINTs and quotas use integer
    division ``(B·w_s) DIV W`` — no float ratios reach the output. Scale:
    the quota table is |domains| rows (broadcast); ranking is ONE
    row_number window hash-partitioned by source — per-domain rank, not a
    global sort, so no single-reducer bottleneck at 10^9 docs."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    stats = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    w = stats.withColumn(
        "w_s",
        F.round(F.pow(F.col("n_s").cast("double"), F.lit(MIX_ALPHA)) * _W_SCALE)
        .cast("long"),
    )
    tot = w.agg(F.sum("n_s").alias("n_total"), F.sum("w_s").alias("w_total"))
    # budget·w_s can exceed 2^63 at 10^8+ docs (w_s ≈ n^0.7·1e6); route the
    # product through DECIMAL(38,0) — Spark's `div` on decimals is exact
    # integral division, the DuckDB twin uses HUGEINT — so the quota stays
    # bit-identical across engines at any table size that fits 38 digits
    quota = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "q_s",
            F.expr(
                "CAST((CAST((n_total * {pct}) DIV 100 AS DECIMAL(38,0)) * w_s)"
                " DIV w_total AS BIGINT)".format(pct=MIX_BUDGET_PCT)
            ),
        )
        .select("source", "q_s")
    )
    ranked = docs.withColumn(
        "draw", h64(F.concat(F.lit("dmx|"), F.col("doc_id").cast("string")))
    ).withColumn(
        "src_rank",
        F.row_number().over(
            Window.partitionBy("source").orderBy("draw", "doc_id")
        ).cast("long"),
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .where(F.col("src_rank") <= F.col("q_s"))
        .select("doc_id", "source", "src_rank")
        .orderBy("doc_id")
    )


DOMAIN_MIXTURE_SQL = f"""
WITH s AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), w AS (
  SELECT source, n_s,
         CAST(ROUND(POWER(CAST(n_s AS DOUBLE), {MIX_ALPHA}) * {_W_SCALE})
              AS BIGINT) AS w_s
  FROM s
), t AS (
  SELECT SUM(n_s) AS n_total, SUM(w_s) AS w_total FROM w
), q AS (
  SELECT source,
         CAST((CAST(((SELECT n_total FROM t) * {MIX_BUDGET_PCT}) // 100
                    AS HUGEINT) * w_s)
              // (SELECT w_total FROM t) AS BIGINT) AS q_s
  FROM w
), r AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ({h64_sql(x="'dmx|' || CAST(doc_id AS VARCHAR)")}), doc_id
         ) AS BIGINT) AS src_rank
  FROM documents
)
SELECT r.doc_id, r.source, r.src_rank
FROM r JOIN q USING (source)
WHERE r.src_rank <= q.q_s
ORDER BY doc_id
"""


# Corpus-trained character-trigram LM quality score (the CCNet-style
# perplexity filter, self-trained: no external LM in this sandbox).
_LP_SCALE = 1_000_000


def _char_trigrams(docs: DataFrame, *carry: str) -> DataFrame:
    """(doc_id, *carry, g) — every char-trigram occurrence of the
    ``[a-z ]``-normalized text, with multiplicity. Pure Catalyst
    (sequence + substring), zero UDF; docs shorter than one trigram emit
    no rows. Shared by the LM-quality and DSIR importance scorers."""
    return docs.select(
        "doc_id", *carry,
        F.regexp_replace(F.lower("text"), "[^a-z ]", "").alias("t"),
    ).select(
        "doc_id", *carry,
        F.explode(
            F.when(
                F.length("t") >= 3,
                F.expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )


def trigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-model quality score, trained on the
    corpus itself: normalize text to ``[a-z ]``, count every trigram
    occurrence corpus-wide, then score each document by its mean trigram
    log-likelihood ``avg_logp = mean(ln(c_g / total))`` — the CCNet-style
    perplexity filter (low avg_logp = unusual character statistics =
    boilerplate/garbled/OCR noise; filter the bottom tail). Self-training
    means every document trigram exists in the table — no smoothing term.

    Cross-engine float discipline: per-trigram log-probs are rounded ONCE
    to fixed-point BIGINTs (``round(ln(p)·1e6)``), so the per-document
    reduction is an integer SUM — order-independent and exact across
    Spark and DuckDB; only the final mean is a (deterministic) division.

    Scale shape: trigram vocab ≤ 27³ ≈ 20k rows — counted in one shuffle,
    then BROADCAST back to the per-document gram counts (second and last
    shuffle). The explode is map-side Catalyst (sequence + substring), no
    UDF; nothing driver-side. Documents whose normalized text is shorter
    than 3 chars score NULL with n_grams = 0."""
    from nessie_spark.operators.dedup import _spread

    grams = _char_trigrams(_spread(spark, T(spark, sf_dir, "documents")))
    # one (doc, gram) count pass, checkpointed: it feeds BOTH the corpus
    # LM and the per-doc scorer — uncheckpointed, Catalyst re-runs the
    # whole explode per consumer (and the single-file scan serializes it)
    dg = grams.groupBy("doc_id", "g").agg(F.count("*").alias("k")).localCheckpoint(
        eager=True
    )
    cnt = dg.groupBy("g").agg(F.sum("k").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n_total"))
    lp = cnt.crossJoin(F.broadcast(tot)).select(
        "g",
        F.round(F.log(F.col("c") / F.col("n_total")) * _LP_SCALE)
        .cast("long")
        .alias("lp"),
    )
    per_doc = (
        dg.join(F.broadcast(lp), "g")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("k") * F.col("lp")).alias("s"),
            F.sum("k").alias("n_grams"),
        )
    )
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.round(
                F.col("s").cast("double") / F.col("n_grams") / _LP_SCALE, 6
            ).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


TRIGRAM_LM_SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
  FROM documents
), g AS (
  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS g
  FROM d, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
), cnt AS (
  SELECT g, COUNT(*) AS c FROM g GROUP BY g
), tot AS (
  SELECT SUM(c) AS n_total FROM cnt
), lp AS (
  SELECT g,
         CAST(ROUND(LN(CAST(c AS DOUBLE) / (SELECT n_total FROM tot))
                    * {_LP_SCALE}) AS BIGINT) AS lp
  FROM cnt
), dg AS (
  SELECT doc_id, g, COUNT(*) AS k FROM g GROUP BY doc_id, g
), sc AS (
  SELECT dg.doc_id, SUM(dg.k * lp.lp) AS s, SUM(dg.k) AS n_grams
  FROM dg JOIN lp USING (g) GROUP BY dg.doc_id
)
SELECT docs.doc_id,
       CAST(COALESCE(sc.n_grams, 0) AS BIGINT) AS n_grams,
       ROUND(CAST(sc.s AS DOUBLE) / sc.n_grams / {_LP_SCALE}, 6) AS avg_logp
FROM documents docs LEFT JOIN sc ON docs.doc_id = sc.doc_id
ORDER BY docs.doc_id
"""


# DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score raw docs by the
# log-likelihood ratio between a TARGET-domain n-gram LM and the raw-corpus
# LM; keep docs that look more target-like than corpus-like.
TARGET_SOURCE = "src0"  # the designated target-domain split


def dsir_importance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance score for every non-target document: the mean
    char-trigram log-likelihood ratio ``ln p_target(g) − ln p_corpus(g)``,
    with the target LM add-one smoothed over the corpus trigram vocabulary
    (so unseen-in-target grams get finite mass) and the corpus LM unsmoothed
    (every doc gram exists in it by construction). ``keep = Σ k·lpd > 0``
    — the doc is more probable under the target domain than under the raw
    corpus, DSIR's selection direction. docstring ref: Xie et al. 2023 use
    hashed word-bigram features; char-trigrams are this engine's sandbox
    stand-in with the identical estimator shape.

    Cross-engine float discipline (same as ``trigram_lm_quality``): the
    per-gram log-ratio is rounded ONCE to a fixed-point BIGINT, per-doc
    reduction is an integer SUM (order-independent), and the keep decision
    compares that integer to zero — bit-identical across Spark and DuckDB.

    Scale shape: both LMs live in the ≤27³-row trigram table (one shuffle
    to count, then BROADCAST back); per-doc scoring is one groupBy over
    (doc, gram) counts — the same two-shuffle plan as the quality scorer,
    independent of corpus size beyond the linear gram pass."""
    from nessie_spark.operators.dedup import _spread

    docs = T(spark, sf_dir, "documents")
    grams = _char_trigrams(_spread(spark, docs), "source")
    # one (doc, source, gram) count pass, checkpointed: corpus LM, target
    # LM, and the per-doc scorer all derive from it (three consumers —
    # uncheckpointed, the explode re-runs per consumer)
    dg0 = grams.groupBy("doc_id", "source", "g").agg(
        F.count("*").alias("k")
    ).localCheckpoint(eager=True)
    cnt_c = dg0.groupBy("g").agg(F.sum("k").alias("c_c"))
    cnt_t = (
        dg0.where(F.col("source") == TARGET_SOURCE)
        .groupBy("g")
        .agg(F.sum("k").alias("c_t"))
    )
    totals = cnt_c.join(cnt_t, "g", "left").agg(
        F.sum("c_c").alias("n_c"),
        F.coalesce(F.sum("c_t"), F.lit(0)).alias("n_t"),
        F.count("*").alias("v"),
    )
    lpd = (
        cnt_c.join(cnt_t, "g", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "g",
            F.round(
                (
                    F.log(
                        (F.coalesce("c_t", F.lit(0)) + 1).cast("double")
                        / (F.col("n_t") + F.col("v"))
                    )
                    - F.log(F.col("c_c").cast("double") / F.col("n_c"))
                )
                * _LP_SCALE
            )
            .cast("long")
            .alias("lpd"),
        )
    )
    per_doc = (
        dg0.where(F.col("source") != TARGET_SOURCE)
        .join(F.broadcast(lpd), "g")
        .groupBy("doc_id")
        .agg(F.sum(F.col("k") * F.col("lpd")).alias("s"), F.sum("k").alias("n_grams"))
    )
    return (
        docs.where(F.col("source") != TARGET_SOURCE)
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.round(
                F.col("s").cast("double") / F.col("n_grams") / _LP_SCALE, 6
            ).alias("avg_log_ratio"),
            F.coalesce(F.col("s") > 0, F.lit(False)).alias("keep"),
        )
        .orderBy("doc_id")
    )


DSIR_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
  FROM documents
), g AS (
  SELECT doc_id, source, substr(t, CAST(i AS INT), 3) AS g
  FROM d, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
), cnt_c AS (
  SELECT g, COUNT(*) AS c_c FROM g GROUP BY g
), cnt_t AS (
  SELECT g, COUNT(*) AS c_t FROM g WHERE source = '{TARGET_SOURCE}' GROUP BY g
), tot AS (
  SELECT SUM(c_c) AS n_c,
         (SELECT COALESCE(SUM(c_t), 0) FROM cnt_t) AS n_t,
         COUNT(*) AS v
  FROM cnt_c
), lpd AS (
  SELECT cnt_c.g,
         CAST(ROUND((LN(CAST(COALESCE(cnt_t.c_t, 0) + 1 AS DOUBLE)
                        / ((SELECT n_t FROM tot) + (SELECT v FROM tot)))
                     - LN(CAST(cnt_c.c_c AS DOUBLE) / (SELECT n_c FROM tot)))
                    * {_LP_SCALE}) AS BIGINT) AS lpd
  FROM cnt_c LEFT JOIN cnt_t USING (g)
), dg AS (
  SELECT doc_id, g, COUNT(*) AS k FROM g
  WHERE source <> '{TARGET_SOURCE}' GROUP BY doc_id, g
), sc AS (
  SELECT dg.doc_id, SUM(dg.k * lpd.lpd) AS s, SUM(dg.k) AS n_grams
  FROM dg JOIN lpd USING (g) GROUP BY dg.doc_id
)
SELECT docs.doc_id,
       CAST(COALESCE(sc.n_grams, 0) AS BIGINT) AS n_grams,
       ROUND(CAST(sc.s AS DOUBLE) / sc.n_grams / {_LP_SCALE}, 6) AS avg_log_ratio,
       COALESCE(sc.s > 0, FALSE) AS keep
FROM documents docs LEFT JOIN sc USING (doc_id)
WHERE docs.source <> '{TARGET_SOURCE}'
ORDER BY docs.doc_id
"""


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training

BPE_MERGES = 12  # merge operations learned per run


def _fold_merge(a: str, b: str):
    """Column transform applying ONE learned merge (a,b)→ab to a symbol
    array, greedy left-to-right non-overlapping — a Catalyst ``aggregate``
    fold, JVM-side, built with column args (never string interpolation:
    corpus tokens may contain quotes). Equivalent to the textbook two-index
    scan: a token just produced by this merge can never immediately
    re-merge, because that would need ``a == a+b`` (empty ``b``)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)

    def _apply(col):
        return F.aggregate(
            col,
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lab)),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    return _apply


def bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn byte-pair-encoding merges from the corpus, distributed — the
    tokenizer-training job a 100 TB pipeline runs before anything is
    tokenized (Sennrich et al. 2016). Classic algorithm: words start as
    character sequences (+ ``</w>`` terminator); each round counts
    adjacent symbol pairs weighted by word frequency, merges the most
    frequent pair everywhere (greedy left-to-right, non-overlapping), and
    repeats.

    Scale shape — the key trick is WHERE the loop runs: the corpus is
    touched ONCE (word count); every merge round then operates on the
    DISTINCT-WORD table (vocabulary-sized, millions of rows at web scale
    — not the trillions of corpus tokens), so each of the M rounds is one
    pair-count shuffle over the vocab plus a map-side fold that applies
    the merge. Driver traffic per round is one (pair, count) scalar —
    picked by count DESC with a lexicographic tie-break so the learned
    table is deterministic across partitionings. The merge application is
    a Catalyst ``aggregate`` fold over each word's symbol array (built
    with column args, never string interpolation — corpus tokens may
    contain quotes); localCheckpoint per round truncates the 12-round
    lineage exactly like the other iterative ops (Dawid–Skene, PageRank,
    connected components).

    Not SQL-expressible (iterative argmax + re-segmentation) → rows-only
    gate; tests/test_bpe.py proves the merge table equals a pure-Python
    reference BPE on planted corpora and on real testdata."""
    docs = T(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.expr("concat(split(w, ''), array('</w>'))").alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    out = []
    for rank in range(BPE_MERGES):
        pairs = words.select(
            "freq",
            F.explode(
                # guard: sequence(1, 0) DESCENDS on fully-merged
                # single-symbol words, driving element_at to index 0
                F.expr(
                    "CASE WHEN size(s) >= 2 THEN"
                    " transform(sequence(1, size(s) - 1),"
                    "  j -> struct(element_at(s, j) as a,"
                    "              element_at(s, j + 1) as b))"
                    " ELSE cast(array() as array<struct<a:string,b:string>>)"
                    " END"
                )
            ).alias("p"),
        ).select("freq", "p.a", "p.b")
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0].a, best[0].b, best[0].cnt
        words = words.select(
            "freq", _fold_merge(a, b)(F.col("s")).alias("s")
        ).localCheckpoint(eager=True)
        out.append((rank, a, b, a + b, int(cnt)))
    return spark.createDataFrame(
        out, "rank int, left string, right string, merged string, pair_freq long"
    ).orderBy("rank")



def bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the learned BPE merges to tokenize the whole corpus — the
    second half of the tokenizer pipeline (train → encode) that turns a
    cleaned corpus into token-budget facts: per-document word count, BPE
    token count, and compression (chars per token).

    Scale shape — same vocabulary trick as training: merges are applied on
    the DISTINCT-WORD table (millions of rows at web scale), never on the
    corpus tokens (trillions); the per-doc counts then come from ONE
    equi-join of (doc_id, word, k) against (word, n_tokens) and a groupBy.
    The merge table itself is a ~vocab-size driver constant (12 rows
    here), folded into the plan as chained Catalyst ``aggregate`` lambdas
    — JVM-side, zero Python in the hot path — with a localCheckpoint
    every 4 merges to keep the expression tree and lineage bounded at
    production merge counts (32k merges = 8k checkpointed stages of pure
    map work, no shuffles). Token counts include the ``</w>`` terminator
    symbol when unmerged, faithful to the Sennrich representation.

    Not SQL-expressible (the merge table comes from iterative training) →
    rows-only gate; tests/test_bpe.py proves per-doc token counts equal a
    pure-Python reference encoder on planted corpora and real testdata."""
    docs = T(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"]) for r in bpe_vocab_merges(spark, sf_dir).collect()
    ]
    doc_words = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+")
            ).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)  # two consumers: vocab + the join
    )
    vocab = doc_words.select("w").distinct().select(
        "w", F.expr("concat(split(w, ''), array('</w>'))").alias("s")
    )
    for i, (a, b) in enumerate(merges):
        vocab = vocab.select("w", _fold_merge(a, b)(F.col("s")).alias("s"))
        if (i + 1) % 4 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    vocab = vocab.select("w", F.size("s").alias("n_tok"))
    stats = (
        doc_words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_words"),
            F.sum(F.col("k") * F.col("n_tok")).alias("n_tokens"),
            F.sum(F.col("k") * F.length("w")).alias("n_chars"),
        )
    )
    return (
        docs.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens"), 4
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


QUERIES: dict[str, tuple] = {
    "doc_pack_sequences": (doc_pack_sequences, DOC_PACK_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
    "domain_mixture_sample": (domain_mixture_sample, DOMAIN_MIXTURE_SQL),
    "trigram_lm_quality": (trigram_lm_quality, TRIGRAM_LM_SQL),
    "dsir_importance_score": (dsir_importance_score, DSIR_SQL),
    "bpe_vocab_merges": (bpe_vocab_merges, None),
    "bpe_tokenize_stats": (bpe_tokenize_stats, None),
}

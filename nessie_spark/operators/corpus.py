"""Corpus-level diagnostics for training-data curation.

Four oracle-backed queries that evaluate the corpus (and our own curation
heuristics) rather than individual documents:

- ``langid_confusion``: confusion matrix of the marker-word language-ID
  heuristic vs the gold ``lang`` column — the evaluation half of the
  reference's detector-vs-gold workflow (nessie evaluates every detector
  against gold labels; here the "detector" is lang-ID and gold is ``lang``).
- ``sentence_dup_stats``: sentence-level exact duplication — the unit-level
  complement to document-level dedup (boilerplate sentences repeat across
  pages long before whole documents do).
- ``ngram_novelty``: vocabulary-growth curve — new trigrams contributed per
  doc-id bucket, the Heaps'-law diagnostic used to judge corpus diversity.
- ``embedding_norm_outliers``: exact integer-arithmetic z-score flags on
  embedding L2 norms (degenerate encoder outputs show up as norm outliers).

Scale notes per query are in the docstrings; the common rules: shuffle 64-bit
hashes instead of strings, aggregate with partial (map-side) combine, keep
cross-engine floats fixed-point until the final select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nessie_spark.functions.core import h64
from nessie_spark.operators.common import T, h64_sql
from nessie_spark.operators.textstats import lang_pred_df, lang_pred_sql_parts


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of marker-word language ID vs the gold ``lang``.

    One groupBy on (lang, pred_lang) — at most |langs|² output rows, full
    map-side combine, so the shuffle is bounded by the lexicon size no
    matter the corpus size. ``frac_of_true`` is each cell's share of its
    true-language row (a broadcast-size join back on ``lang``)."""
    docs = T(spark, sf_dir, "documents")
    cells = (
        lang_pred_df(docs)  # the SAME predictor frame lang_id_markers ships
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )
    totals = cells.groupBy("lang").agg(F.sum("n").alias("n_true"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "pred_lang",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_true"), 6).alias(
                "frac_of_true"
            ),
        )
        .orderBy("lang", "pred_lang")
    )


def _langid_confusion_sql() -> str:
    ctes, pred, _best = lang_pred_sql_parts()
    return f"""
WITH {ctes}, cells AS (
  SELECT lang, {pred} AS pred_lang, COUNT(*) AS n
  FROM counted GROUP BY lang, {pred}
), totals AS (
  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_true FROM cells GROUP BY lang
)
SELECT c.lang, c.pred_lang, c.n,
       ROUND(CAST(c.n AS DOUBLE) / t.n_true, 6) AS frac_of_true
FROM cells c JOIN totals t ON c.lang = t.lang
ORDER BY c.lang, c.pred_lang
"""


_MIN_SENT_CHARS = 20


def sentence_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level exact duplication per document.

    Split on '.', keep trimmed lowercase sentences of ≥20 chars, and call a
    sentence duplicated when it occurs in ≥2 distinct documents. Per doc:
    how many qualifying sentences, how many are corpus-duplicated, and the
    duplicated fraction — the boilerplate detector that document-level
    dedup misses (nav bars, license footers, cookie banners).

    Scale shape: the explode ships (doc_id, h64(sentence)) — 16 bytes per
    sentence, never the sentence text. Duplicated-key detection is
    min(doc_id) != max(doc_id) per hash (two partial aggregates, no
    countDistinct Expand). Second and last shuffle re-groups by doc."""
    docs = T(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split("text", r"\."), lambda s: F.lower(F.trim(s))),
        lambda s: F.length(s) >= _MIN_SENT_CHARS,
    )
    units = (
        docs.select("doc_id", F.explode(sents).alias("sent"))
        .select("doc_id", h64(F.col("sent")).alias("sh"))
    )
    # a sentence repeated inside ONE doc is not corpus-duplication: collapse
    # to distinct (doc, hash) first, then test the doc-id span per hash
    per = units.distinct()
    spans = per.groupBy("sh").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("is_dup")
    )
    stats = (
        per.join(spans, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sents"),
            F.sum(F.col("is_dup").cast("int")).alias("n_dup_sents"),
        )
    )
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_sents", F.lit(0)).alias("n_sents"),
            F.coalesce("n_dup_sents", F.lit(0)).alias("n_dup_sents"),
            F.round(
                F.when(
                    F.coalesce("n_sents", F.lit(0)) > 0,
                    F.col("n_dup_sents").cast("double") / F.col("n_sents"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


SENTENCE_DUP_SQL = f"""
WITH units AS (
  SELECT DISTINCT doc_id, {h64_sql(x='s')} AS sh
  FROM (
    SELECT doc_id, lower(trim(u)) AS s
    FROM (SELECT doc_id, unnest(string_split(text, '.')) AS u FROM documents)
  )
  WHERE length(s) >= {_MIN_SENT_CHARS}
), spans AS (
  SELECT sh, (MIN(doc_id) != MAX(doc_id)) AS is_dup FROM units GROUP BY sh
), stats AS (
  SELECT u.doc_id, COUNT(*) AS n_sents,
         CAST(SUM(CASE WHEN s.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_sents
  FROM units u JOIN spans s ON u.sh = s.sh GROUP BY u.doc_id
)
SELECT d.doc_id,
       COALESCE(n_sents, 0) AS n_sents,
       COALESCE(n_dup_sents, 0) AS n_dup_sents,
       ROUND(CASE WHEN COALESCE(n_sents, 0) > 0
                  THEN CAST(n_dup_sents AS DOUBLE) / n_sents ELSE 0.0 END, 6)
         AS dup_frac
FROM documents d LEFT JOIN stats USING (doc_id)
ORDER BY d.doc_id
"""


_NOVELTY_BUCKETS = 100


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve over word trigrams.

    Docs are split into ``_NOVELTY_BUCKETS`` equal doc-id ranges; a trigram
    is "new" in the bucket holding the smallest doc_id that contains it.
    Reports per-bucket new-trigram counts and the running vocabulary size.

    Scale shape: grams travel as h64 hashes; first-occurrence is a single
    min(doc_id) groupBy with map-side combine; the output is exactly
    ``_NOVELTY_BUCKETS`` rows, so the cumulative window over an unbounded
    frame is a driver-trivial 100-row pass — the curve never requires a
    global per-document ordered window (which would single-partition at
    10^9 docs)."""
    docs = T(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id").alias("m"))
    ts = F.split(F.trim(F.lower("text")), r"[ \t\n\f\r]+")
    grams = (
        docs.select("doc_id", ts.alias("ts"))
        .where(F.size("ts") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ts) - 3),"
                    " i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))"
                )
            ).alias("g"),
        )
        .select("doc_id", h64(F.col("g")).alias("gh"))
    )
    first = grams.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    bucketed = first.crossJoin(F.broadcast(max_id)).select(
        F.least(
            F.floor(
                F.col("first_doc") * _NOVELTY_BUCKETS / (F.col("m") + F.lit(1))
            ),
            F.lit(_NOVELTY_BUCKETS - 1),
        )
        .cast("bigint")
        .alias("bucket")
    )
    per_bucket = bucketed.groupBy("bucket").agg(F.count("*").alias("new_grams"))
    # unpartitioned window is safe: the frame is _NOVELTY_BUCKETS rows
    # (the curve's x-axis), not the gram table
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.withColumn("cum_vocab", F.sum("new_grams").over(w))
        .select("bucket", "new_grams", "cum_vocab")
        .orderBy("bucket")
    )


NGRAM_NOVELTY_SQL = f"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\f\\r]+') AS ts
  FROM documents
), grams AS (
  SELECT doc_id,
         {h64_sql(x="(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])")} AS gh
  FROM (
    SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
    FROM d WHERE len(ts) >= 3
  )
), first AS (
  SELECT gh, MIN(doc_id) AS first_doc FROM grams GROUP BY gh
), mx AS (
  SELECT MAX(doc_id) AS m FROM documents
), bucketed AS (
  SELECT LEAST(
           CAST(FLOOR(first_doc * {_NOVELTY_BUCKETS} / (m + 1)) AS BIGINT),
           {_NOVELTY_BUCKETS - 1}) AS bucket
  FROM first, mx
), per_bucket AS (
  SELECT bucket, COUNT(*) AS new_grams FROM bucketed GROUP BY bucket
)
SELECT bucket, new_grams,
       CAST(SUM(new_grams) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM per_bucket ORDER BY bucket
"""


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag embeddings whose L2 norm is >2 corpus standard deviations from
    the mean — degenerate encoder outputs (zero vectors, saturated vectors)
    land here before any cosine-based detector sees them.

    Cross-engine float discipline: each norm is rounded ONCE to fixed-point
    (``round(norm·1e6)`` as BIGINT); the corpus mean/variance then use only
    exact integer sums (DECIMAL(38,0) for the squared terms), and the z
    test is the integer comparison ``(n·x − Σx)² > 4·(n·Σx² − (Σx)²)`` —
    no float reduction anywhere, so Spark and DuckDB agree bit-for-bit.

    Scale shape: one partial-aggregate pass for (Σx, Σx², n), broadcast the
    three scalars back, one map over the rows. No shuffle of vectors."""
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"
        ).alias("sq"),
    )
    fp = emb.select(
        "vec_id",
        F.round(F.sqrt("sq"), 6).alias("norm"),
        F.round(F.sqrt("sq") * 1e6).cast("bigint").alias("x"),
    )
    stats = fp.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dev = dec("n") * dec("x") - dec("sx")
    var_n2 = dec("n") * F.col("sxx") - dec("sx") * dec("sx")
    return (
        fp.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            "norm",
            (dev * dev > F.lit(4).cast("decimal(38,0)") * var_n2).alias(
                "is_outlier"
            ),
        )
        .orderBy("vec_id")
    )


EMBEDDING_NORM_SQL = """
WITH fp AS (
  SELECT vec_id,
         ROUND(sqrt(list_sum([CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                              for v in embedding])), 6) AS norm,
         CAST(ROUND(sqrt(list_sum([CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                              for v in embedding])) * 1e6) AS BIGINT) AS x
  FROM embeddings
), stats AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM fp
)
SELECT vec_id, norm,
       ((n * x - sx) * (n * x - sx)
          > CAST(4 AS HUGEINT) * (n * sxx - sx * sx)) AS is_outlier
FROM fp, stats
ORDER BY vec_id
"""


_WIN_K = 5  # chars per gram
_WIN_W = 4  # grams per winnowing window
_WIN_DF_CAP = 64  # fingerprints shared by more docs are stop-fingerprints
_WIN_MIN_SHARED = 3


def _win_fps(col):
    """Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm):
    hash every ``_WIN_K``-char gram of the normalized text, slide a window
    of ``_WIN_W`` gram hashes, keep each window's minimum — guarantees any
    shared substring of length ≥ K+W−1 contributes a shared fingerprint,
    while storing ~2/(W+1) of the grams. Arrow-batched UDF over the
    PRE-normalized string (normalization stays Catalyst-side so the Python
    and SQL twins share one definition); md5-prefix hashes are bit-identical
    to the h64 family used everywhere else."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _fp(texts):
        import hashlib

        import pandas as pd

        out = []
        for s in texts:
            s = s or ""
            n = len(s)
            if n < _WIN_K:
                out.append([])
                continue
            hs = [
                int(hashlib.md5(s[i : i + _WIN_K].encode("utf-8")).hexdigest()[:15], 16)
                for i in range(n - _WIN_K + 1)
            ]
            m = len(hs) - _WIN_W + 1
            fps = {min(hs)} if m <= 0 else {min(hs[j : j + _WIN_W]) for j in range(m)}
            out.append(sorted(fps))
        return pd.Series(out)

    return _fp(col)


def _win_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nessie_spark.operators.dedup import _spread

    docs = _spread(spark, T(spark, sf_dir, "documents").select("doc_id", "text"))
    norm = docs.select(
        "doc_id", F.regexp_replace(F.lower("text"), "[^a-z ]", "").alias("t")
    )
    return norm.select(
        "doc_id",
        F.greatest(F.length("t") - (_WIN_K - 1), F.lit(0)).alias("n_grams"),
        _win_fps(F.col("t")).alias("fps"),
    )


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint stats: gram count, selected
    fingerprint count, and selection density (≈ 2/(W+1) for random text —
    a density far above that means repetitive content).

    Scale shape: one Arrow-batched map, zero shuffles (the final orderBy
    is the gate's canonical sort)."""
    return (
        _win_base(spark, sf_dir)
        .select(
            "doc_id",
            "n_grams",
            F.size("fps").alias("n_fingerprints"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.size("fps").cast("double") / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("density"),
        )
        .orderBy("doc_id")
    )


def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing ≥ ``_WIN_MIN_SHARED`` winnowing fingerprints
    — the MOSS plagiarism-detection join. Guaranteed to catch any pair
    sharing a run of ≥ K+W−1 = 8 normalized chars per shared fingerprint.

    Scale shape: inverted index on the fingerprint hash (explode ships
    (doc, 8-byte hash) only); fingerprints in more than ``_WIN_DF_CAP``
    docs are dropped as stop-fingerprints BEFORE the self-join (the same
    hot-key cutoff as ngram_jaccard's DF_CAP, mirrored in the oracle), so
    the per-hash pair fanout is bounded at CAP² regardless of corpus."""
    # the md5-heavy fingerprint UDF feeds THREE consumers (the df filter
    # and both sides of the self-join) — uncheckpointed, Catalyst
    # re-executes it per consumer (the standard multi-consumer-UDF lesson;
    # measured 9.2 s → ~3 s warm at sf0.1)
    fps = (
        _win_base(spark, sf_dir)
        .select("doc_id", F.explode("fps").alias("fp"))
        .localCheckpoint(eager=True)
    )
    df_ok = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _WIN_DF_CAP))
        .select("fp")
    )
    idx = fps.join(df_ok, "fp")
    a = idx.alias("a")
    b = idx.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= _WIN_MIN_SHARED)
        .orderBy("id_a", "id_b")
    )


def _win_fps_sql() -> str:
    gram_h = h64_sql(x=f"substr(t, CAST(i AS INT), {_WIN_K})")
    return f"""
  SELECT doc_id,
         GREATEST(len(t) - {_WIN_K - 1}, 0) AS n_grams,
         CASE
           WHEN len(t) < {_WIN_K} THEN []
           WHEN len(hs) < {_WIN_W} THEN [list_min(hs)]
           ELSE list_distinct([
             list_min(hs[j:j+{_WIN_W - 1}])
             for j in range(1, len(hs) - {_WIN_W - 2})
           ])
         END AS fps
  FROM (
    SELECT doc_id, t,
           [{gram_h} for i in range(1, len(t) - {_WIN_K - 1} + 1)] AS hs
    FROM (SELECT doc_id,
                 regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
          FROM documents)
  )
"""


WINNOWING_FP_SQL = f"""
WITH base AS ({_win_fps_sql()})
SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
       CAST(len(fps) AS INT) AS n_fingerprints,
       ROUND(CASE WHEN n_grams > 0
                  THEN CAST(len(fps) AS DOUBLE) / n_grams ELSE 0.0 END, 6)
         AS density
FROM base ORDER BY doc_id
"""

WINNOWING_PAIRS_SQL = f"""
WITH base AS ({_win_fps_sql()}),
fps AS (SELECT doc_id, unnest(fps) AS fp FROM base),
ok AS (
  SELECT fp FROM fps GROUP BY fp
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {_WIN_DF_CAP}
), idx AS (SELECT f.doc_id, f.fp FROM fps f JOIN ok USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {_WIN_MIN_SHARED}
ORDER BY id_a, id_b
"""


QUERIES: dict[str, tuple] = {
    "langid_confusion": (langid_confusion, _langid_confusion_sql()),
    "winnowing_fingerprints": (winnowing_fingerprints, WINNOWING_FP_SQL),
    "winnowing_overlap_pairs": (winnowing_overlap_pairs, WINNOWING_PAIRS_SQL),
    "sentence_dup_stats": (sentence_dup_stats, SENTENCE_DUP_SQL),
    "ngram_novelty": (ngram_novelty, NGRAM_NOVELTY_SQL),
    "embedding_norm_outliers": (embedding_norm_outliers, EMBEDDING_NORM_SQL),
}

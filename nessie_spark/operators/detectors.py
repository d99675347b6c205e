"""Annotation-error-detection operators, re-expressed Spark-first.

Each operator is the faithful graft of a reference detector (file:line in
each docstring) onto the testdata: ``documents.lang`` plays the noisy label,
``documents.source`` the surface form / group, ``embeddings`` the feature
space. All detectors return per-instance flag/score DataFrames joined by id
— never positional.

Scale shapes: every operator here is (groupBy → broadcast join-back) or a
window — one shuffle each, dimension side tiny, exactly the EP3 lifecycle of
SURVEY.md §3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.operators.common import T


def majority_label_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MajorityLabelBaseline (/root/reference/nessie/detectors/baselines.py:11-46):
    global mode of labels; flag every instance whose label ≠ mode.
    Spark: count-desc/label-asc argmax + broadcast crossJoin."""
    docs = T(spark, sf_dir, "documents")
    mode = (
        docs.groupBy("lang")
        .count()
        .orderBy(F.desc("count"), F.asc("lang"))
        .limit(1)
        .select(F.col("lang").alias("mode_lang"))
    )
    return (
        docs.crossJoin(F.broadcast(mode))
        .select(
            "doc_id",
            "lang",
            (F.col("lang") != F.col("mode_lang")).alias("flag"),
        )
        .orderBy("doc_id")
    )


MAJORITY_LABEL_SQL = """
WITH mode AS (
  SELECT lang AS mode_lang FROM documents
  GROUP BY lang ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
)
SELECT doc_id, lang, lang != mode_lang AS flag
FROM documents CROSS JOIN mode
ORDER BY doc_id
"""


def majority_per_surface_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MajorityLabelPerSurfaceFormBaseline (baselines.py:49-96): mode per
    group (source ≙ lowercased surface form); flag minority members;
    ``corrected`` = the group mode (the reference's correct(), Retag-shape
    P2 retag.py:39-40)."""
    docs = T(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").count()
    w = Window.partitionBy("source").orderBy(F.desc("count"), F.asc("lang"))
    modal = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("source", F.col("lang").alias("corrected"))
    )
    return (
        docs.join(F.broadcast(modal), "source")
        .select(
            "doc_id",
            "lang",
            "corrected",
            (F.col("lang") != F.col("corrected")).alias("flag"),
        )
        .orderBy("doc_id")
    )


MAJORITY_PER_SURFACE_SQL = """
WITH counts AS (
  SELECT source, lang, COUNT(*) AS cnt FROM documents GROUP BY source, lang
), modal AS (
  SELECT source, lang AS corrected
  FROM (SELECT source, lang, ROW_NUMBER() OVER
          (PARTITION BY source ORDER BY cnt DESC, lang ASC) AS rk FROM counts)
  WHERE rk = 1
)
SELECT d.doc_id, d.lang, m.corrected, d.lang != m.corrected AS flag
FROM documents d JOIN modal m USING (source)
ORDER BY d.doc_id
"""


def label_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LabelEntropy (/root/reference/nessie/detectors/label_entropy.py:21-67):
    per-surface label-distribution entropy (base 2); the surface's majority
    label scores 0; final score = 1 − minmax-rescaled. Two-level aggregation
    + window mode + global min/max broadcast — no Python loop (the reference
    loops per surface, label_entropy.py:37-62)."""
    docs = T(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.groupBy("source").agg(F.sum("cnt").alias("tot"))
    ent = (
        counts.join(tot, "source")
        .groupBy("source")
        .agg(
            (-F.sum(
                (F.col("cnt") / F.col("tot"))
                * F.log2(F.col("cnt") / F.col("tot"))
            )).alias("entropy")
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("lang"))
    modal = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("source", F.col("lang").alias("modal_lang"))
    )
    raw = (
        docs.join(F.broadcast(ent), "source")
        .join(F.broadcast(modal), "source")
        .select(
            "doc_id",
            F.when(F.col("lang") == F.col("modal_lang"), F.lit(0.0))
            .otherwise(F.col("entropy"))
            .alias("raw"),
        )
    )
    mm = raw.agg(F.min("raw").alias("mn"), F.max("raw").alias("mx"))
    return (
        raw.crossJoin(F.broadcast(mm))
        .select(
            "doc_id",
            F.round(
                1
                - F.when(F.col("mx") > F.col("mn"), (F.col("raw") - F.col("mn")) / (F.col("mx") - F.col("mn")))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy("doc_id")
    )


LABEL_ENTROPY_SQL = """
WITH counts AS (
  SELECT source, lang, COUNT(*) AS cnt FROM documents GROUP BY source, lang
), tot AS (
  SELECT source, SUM(cnt) AS tot FROM counts GROUP BY source
), ent AS (
  SELECT counts.source,
         -SUM((cnt / tot) * log2(cnt / tot)) AS entropy
  FROM counts JOIN tot ON counts.source = tot.source
  GROUP BY counts.source
), modal AS (
  SELECT source, lang AS modal_lang
  FROM (SELECT source, lang, ROW_NUMBER() OVER
          (PARTITION BY source ORDER BY cnt DESC, lang ASC) AS rk FROM counts)
  WHERE rk = 1
), raw AS (
  SELECT d.doc_id,
         CASE WHEN d.lang = m.modal_lang THEN 0.0 ELSE e.entropy END AS raw
  FROM documents d
  JOIN ent e ON d.source = e.source
  JOIN modal m ON d.source = m.source
), mm AS (
  SELECT MIN(raw) AS mn, MAX(raw) AS mx FROM raw
)
SELECT doc_id,
       ROUND(1 - CASE WHEN mx > mn THEN (raw - mn) / (mx - mn) ELSE 0.0 END, 6) AS score
FROM raw CROSS JOIN mm
ORDER BY doc_id
"""


def weighted_discrepancy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WeightedDiscrepancy (/root/reference/nessie/detectors/
    weighted_discrepancy.py:17-63): per surface s with label counts c:
    raw = (max(c) − min(c)) / |distinct labels| * n_s for minority rows,
    0 for majority rows; minmax-scaled."""
    docs = T(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.groupBy("source").agg(
        F.max("cnt").alias("cmax"),
        F.min("cnt").alias("cmin"),
        F.sum("cnt").alias("n_s"),
        F.count(F.lit(1)).alias("n_labels"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("lang"))
    modal = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("source", F.col("lang").alias("modal_lang"))
    )
    raw = (
        docs.join(F.broadcast(stats), "source")
        .join(F.broadcast(modal), "source")
        .select(
            "doc_id",
            F.when(
                F.col("lang") != F.col("modal_lang"),
                (F.col("cmax") - F.col("cmin"))
                / F.col("n_labels").cast("double")
                * F.col("n_s"),
            )
            .otherwise(F.lit(0.0))
            .alias("raw"),
        )
    )
    mm = raw.agg(F.min("raw").alias("mn"), F.max("raw").alias("mx"))
    return (
        raw.crossJoin(F.broadcast(mm))
        .select(
            "doc_id",
            F.round(
                F.when(F.col("mx") > F.col("mn"), (F.col("raw") - F.col("mn")) / (F.col("mx") - F.col("mn")))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy("doc_id")
    )


WEIGHTED_DISCREPANCY_SQL = """
WITH counts AS (
  SELECT source, lang, COUNT(*) AS cnt FROM documents GROUP BY source, lang
), stats AS (
  SELECT source, MAX(cnt) AS cmax, MIN(cnt) AS cmin, SUM(cnt) AS n_s,
         COUNT(*) AS n_labels
  FROM counts GROUP BY source
), modal AS (
  SELECT source, lang AS modal_lang
  FROM (SELECT source, lang, ROW_NUMBER() OVER
          (PARTITION BY source ORDER BY cnt DESC, lang ASC) AS rk FROM counts)
  WHERE rk = 1
), raw AS (
  SELECT d.doc_id,
         CASE WHEN d.lang != m.modal_lang
              THEN (s.cmax - s.cmin) / CAST(s.n_labels AS DOUBLE) * s.n_s
              ELSE 0.0 END AS raw
  FROM documents d
  JOIN stats s ON d.source = s.source
  JOIN modal m ON d.source = m.source
), mm AS (SELECT MIN(raw) AS mn, MAX(raw) AS mx FROM raw)
SELECT doc_id,
       ROUND(CASE WHEN mx > mn THEN (raw - mn) / (mx - mn) ELSE 0.0 END, 6) AS score
FROM raw CROSS JOIN mm
ORDER BY doc_id
"""


def borda_count_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BordaCount (/root/reference/nessie/detectors/borda_count.py:21-37):
    ordinal rank per scorer, summed across scorers. Scorers here are three
    deterministic document statistics (all integers → exact oracle). The
    reference's only ranking operator: row_number window + aggregation."""
    docs = T(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("s1"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("s2"),
        F.size(F.array_distinct(F.split(F.trim("text"), r"\s+"))).cast("long").alias("s3"),
    )
    long = scored.selectExpr(
        "doc_id", "stack(3, 's1', s1, 's2', s2, 's3', s3) AS (scorer, score)"
    )
    w = Window.partitionBy("scorer").orderBy(F.asc("score"), F.asc("doc_id"))
    return (
        long.withColumn("rk", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(F.sum("rk").alias("borda"))
        .orderBy("doc_id")
    )


BORDA_SQL = """
WITH scored AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS s1,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS s2,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS s3
  FROM documents
), long AS (
  SELECT doc_id, 's1' AS scorer, s1 AS score FROM scored
  UNION ALL SELECT doc_id, 's2', s2 FROM scored
  UNION ALL SELECT doc_id, 's3', s3 FROM scored
), ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER
           (PARTITION BY scorer ORDER BY score ASC, doc_id ASC) AS rk
  FROM long
)
-- CAST: DuckDB SUM(int) returns HUGEINT (int128); the driver gate converts
-- results via pandas, where HUGEINT degrades to float64/object and the
-- value-hash diverges from Spark's int64 (r1 driver hash FAIL root cause).
SELECT doc_id, CAST(SUM(rk) AS BIGINT) AS borda
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def variation_ngrams_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariationNGrams (/root/reference/nessie/detectors/
    variational_principle.py:16-143), Spark-native rewrite per SURVEY.md
    §2.4 J6: the suffix-tree "maximal repeats" become a bounded n-gram
    inventory — explode word bigrams, group, keep repeats with >1 distinct
    label across occurrences, majority-vote a label, flag the documents on
    the minority side. Output: one row per (bigram, majority)."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("ts")
    )
    grams = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                F.size("ts") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - 2),
                    lambda i: F.concat_ws(" ", F.get(F.col("ts"), i), F.get(F.col("ts"), i + 1)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    ).distinct()  # one vote per (doc, gram)
    counts = grams.groupBy("gram", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.groupBy("gram").agg(
        F.sum("cnt").alias("n_docs"), F.count(F.lit(1)).alias("n_langs")
    )
    w = Window.partitionBy("gram").orderBy(F.desc("cnt"), F.asc("lang"))
    modal = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("gram", F.col("lang").alias("majority_lang"), F.col("cnt").alias("majority_cnt"))
    )
    return (
        stats.where((F.col("n_docs") >= 2) & (F.col("n_langs") >= 2))
        .join(modal, "gram")
        .select("gram", "n_docs", "n_langs", "majority_lang", "majority_cnt")
        .orderBy("gram")
    )


VARIATION_NGRAMS_SQL = """
WITH toks AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, lang,
         ts[i] || ' ' || ts[i+1] AS gram
  FROM toks, UNNEST(range(1, len(ts))) AS t(i)
  WHERE len(ts) >= 2
), counts AS (
  SELECT gram, lang, COUNT(*) AS cnt FROM grams GROUP BY gram, lang
), stats AS (
  -- CAST: avoid HUGEINT in an output column (r1 driver hash FAIL cause)
  SELECT gram, CAST(SUM(cnt) AS BIGINT) AS n_docs, COUNT(*) AS n_langs
  FROM counts GROUP BY gram
), modal AS (
  SELECT gram, lang AS majority_lang, cnt AS majority_cnt
  FROM (SELECT gram, lang, cnt, ROW_NUMBER() OVER
          (PARTITION BY gram ORDER BY cnt DESC, lang ASC) AS rk FROM counts)
  WHERE rk = 1
)
SELECT s.gram, s.n_docs, s.n_langs, m.majority_lang, m.majority_cnt
FROM stats s JOIN modal m USING (gram)
WHERE s.n_docs >= 2 AND s.n_langs >= 2
ORDER BY s.gram
"""


N_MAX = 4


def variation_ngrams_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariationNGrams with the reference's *maximal repeat* semantics
    (/root/reference/nessie/detectors/variational_principle.py:71-123):
    repeats of ANY length ≥2 — not just bigrams — are mined, and only
    maximal ones (not always extendable by the same token on either side)
    vote. The suffix tree's maximal repeats are exactly the left-diverse
    internal nodes (Gusfield), so the Spark-native rewrite is: enumerate
    n-gram occurrences for n ∈ [2, N_MAX] with their neighbor tokens, and
    keep grams where (a) some occurrence is at a sentence boundary (unique
    terminator ⇒ diverse) or (b) >1 distinct neighbor token, on BOTH
    sides. At the N_MAX cap maximality is waived so longer repeats stay
    represented by their length-N_MAX windows (bounded-n approximation,
    SURVEY.md §2.4 J6 "for n in 2..n_max").

    Tokens are lowercased like the reference (:67). Occurrence label =
    the document's lang (this family's noisy-label analog — the
    occurrence's tag sequence is [lang]*n, so the reference's per-position
    mismatch flag reduces to lang != majority_lang). Every occurrence
    votes (duplicate matches in one document included, reference :99-103).

    Scale shape: ~(N_MAX-1)× token count rows through ONE groupBy on the
    gram key; neighbor diversity is plain aggregation — no suffix tree,
    no driver-side state. Occurrence enumeration is a single Arrow-batched
    pass (the Catalyst HOF formulation ran interpreted and scanned the
    table N_MAX-1 times; one vectorized pass measured ~3× faster at
    sf0.1), materialized once for its two plan consumers (the per-lang
    aggregate and the final vote join)."""
    from nessie_spark.operators.dedup import _spread

    docs = _spread(spark, T(spark, sf_dir, "documents").select("doc_id", "lang", "text"))

    def _occ_gen(batches):
        import numpy as np
        import pandas as pd

        # str.split() ≡ re.split(r"\s+") on stripped text (whitespace runs,
        # no empties); doc text is ASCII (synth contract), so Python/Java/
        # RE2 \s agree and .lower() ≡ F.lower. Gram construction is
        # vectorized over ONE flat token array per batch (elementwise
        # object-array concat, n-1 passes) instead of per-doc Python list
        # comprehensions — same strings, ~3× less batch CPU.
        for pdf in batches:
            toks = [
                t.strip().lower().split() if isinstance(t, str) and t.strip() else []
                for t in pdf["text"]
            ]
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
            flat = np.array([w for ts in toks for w in ts], dtype=object)
            if flat.size == 0:
                continue
            docidx = np.repeat(np.arange(len(lens)), lens)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            pos_in_doc = np.arange(flat.size) - np.repeat(starts, lens)
            doc_ids = pdf["doc_id"].to_numpy()
            langs = pdf["lang"].to_numpy()
            parts = []
            g = flat  # length-1 "grams"; extended one token per level
            for n in range(2, N_MAX + 1):
                if flat.size < n:
                    break
                g = g[: flat.size - n + 1] + " "
                g = g + flat[n - 1 :]
                # a start is valid when its n-th token is still in-doc
                valid = docidx[: flat.size - n + 1] == docidx[n - 1 :]
                idx = np.flatnonzero(valid)
                if idx.size == 0:
                    continue
                di = docidx[idx]
                prev = np.where(
                    pos_in_doc[idx] > 0, flat[np.maximum(idx - 1, 0)], None
                )
                nxt_ok = (idx + n < flat.size) & (
                    docidx[np.minimum(idx + n, flat.size - 1)] == di
                )
                nxt = np.where(nxt_ok, flat[np.minimum(idx + n, flat.size - 1)], None)
                parts.append(
                    pd.DataFrame(
                        {
                            "doc_id": doc_ids[di],
                            "lang": langs[di],
                            "n": np.full(idx.size, n, dtype=np.int32),
                            "pos": pos_in_doc[idx].astype(np.int32),
                            "gram": g[idx],
                            "prev": prev,
                            "nxt": nxt,
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    occ = docs.mapInPandas(
        _occ_gen,
        schema="doc_id long, lang string, n int, pos int, gram string, prev string, nxt string",
    ).localCheckpoint(eager=True)

    # ONE shuffle of the big occurrence table, keyed (n, gram, lang). The
    # diversity tests only ask "≥2 distinct neighbors (or a boundary)", so
    # min≠max over non-null neighbors answers them exactly — without the
    # 3× Expand a multi-countDistinct plan pushes through the shuffle —
    # and every gram-level stat re-aggregates from these per-lang partials
    # (n_occ = Σcnt, n_langs = row count, neighbor min/max re-min/re-max).
    lvl1 = occ.groupBy("n", "gram", "lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("prev").alias("mn_p"),
        F.max("prev").alias("mx_p"),
        F.max(F.when(F.col("prev").isNull(), 1).otherwise(0)).alias("null_p"),
        F.min("nxt").alias("mn_x"),
        F.max("nxt").alias("mx_x"),
        F.max(F.when(F.col("nxt").isNull(), 1).otherwise(0)).alias("null_x"),
    ).localCheckpoint(eager=False)  # two consumers: gram stats + modal vote
    grp = lvl1.groupBy("n", "gram").agg(
        F.sum("cnt").alias("n_occ"),
        F.count(F.lit(1)).alias("n_langs"),
        F.min("mn_p").alias("mn_p"),
        F.max("mx_p").alias("mx_p"),
        F.max("null_p").alias("null_p"),
        F.min("mn_x").alias("mn_x"),
        F.max("mx_x").alias("mx_x"),
        F.max("null_x").alias("null_x"),
    )
    div_prev = (F.col("null_p") > 0) | F.coalesce(
        F.col("mn_p") != F.col("mx_p"), F.lit(False)
    )
    div_nxt = (F.col("null_x") > 0) | F.coalesce(
        F.col("mn_x") != F.col("mx_x"), F.lit(False)
    )
    keep = grp.where(
        (F.col("n_occ") >= 2)
        & (F.col("n_langs") >= 2)
        & ((F.col("n") == N_MAX) | (div_prev & div_nxt))
    ).select("n", "gram")
    mw = Window.partitionBy("n", "gram").orderBy(F.desc("cnt"), F.asc("lang"))
    modal = (
        lvl1.withColumn("rk", F.row_number().over(mw))
        .where(F.col("rk") == 1)
        .select("n", "gram", F.col("lang").alias("majority_lang"))
    )
    # ONE gram-level dimension (kept grams ⨝ their modal lang), broadcast to
    # the occurrence side: the occurrence rows — the big side — never
    # shuffle for the vote join. Dim size ∝ distinct repeated grams; if it
    # outgrows broadcast at extreme corpora, dropping the hint restores the
    # (n, gram) shuffle join with the same semantics.
    dim = F.broadcast(keep.join(modal, ["n", "gram"]))
    return (
        occ.join(dim, ["n", "gram"])
        .select(
            "n", "gram", "doc_id", "pos", "lang", "majority_lang",
            (F.col("lang") != F.col("majority_lang")).alias("flag"),
        )
        .orderBy("n", "gram", "doc_id", "pos")
    )


VARIATION_NGRAMS_MULTI_SQL = """
WITH docs AS (
  SELECT doc_id, lang,
         list_transform(regexp_split_to_array(trim(text), '\\s+'),
                        w -> lower(w)) AS ts
  FROM documents
), occ AS (
  SELECT d.doc_id, d.lang, ns.n, CAST(t.i AS INTEGER) AS pos,
         array_to_string(d.ts[CAST(t.i + 1 AS INTEGER)
                              : CAST(t.i + ns.n AS INTEGER)], ' ') AS gram,
         d.ts[CAST(t.i AS INTEGER)] AS prev,
         d.ts[CAST(t.i + ns.n + 1 AS INTEGER)] AS nxt
  FROM docs d
  CROSS JOIN (SELECT unnest([2, 3, 4]) AS n) ns,
  UNNEST(range(0, len(d.ts) - ns.n + 1)) AS t(i)
), grp AS (
  SELECT n, gram, COUNT(*) AS n_occ,
         COUNT(DISTINCT prev) AS d_prev,
         SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS b_prev,
         COUNT(DISTINCT nxt) AS d_nxt,
         SUM(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END) AS b_nxt,
         COUNT(DISTINCT lang) AS n_langs
  FROM occ GROUP BY n, gram
), keep AS (
  SELECT n, gram FROM grp
  WHERE n_occ >= 2 AND n_langs >= 2
    AND (n = 4 OR (((b_prev > 0) OR (d_prev > 1))
               AND ((b_nxt > 0) OR (d_nxt > 1))))
), counts AS (
  SELECT n, gram, lang, COUNT(*) AS cnt FROM occ GROUP BY n, gram, lang
), modal AS (
  SELECT n, gram, lang AS majority_lang
  FROM (SELECT n, gram, lang, ROW_NUMBER() OVER
          (PARTITION BY n, gram ORDER BY cnt DESC, lang ASC) AS rk
        FROM counts)
  WHERE rk = 1
)
SELECT o.n, o.gram, o.doc_id, o.pos, o.lang, m.majority_lang,
       o.lang != m.majority_lang AS flag
FROM occ o
JOIN keep k ON o.n = k.n AND o.gram = k.gram
JOIN modal m ON o.n = m.n AND o.gram = m.gram
ORDER BY o.n, o.gram, o.doc_id, o.pos
"""


QUERIES: dict[str, tuple] = {
    "majority_label_flags": (majority_label_flags, MAJORITY_LABEL_SQL),
    "majority_per_surface_flags": (majority_per_surface_flags, MAJORITY_PER_SURFACE_SQL),
    "label_entropy_scores": (label_entropy_scores, LABEL_ENTROPY_SQL),
    "weighted_discrepancy_scores": (weighted_discrepancy_scores, WEIGHTED_DISCREPANCY_SQL),
    "borda_count_scores": (borda_count_scores, BORDA_SQL),
    "variation_ngrams_flags": (variation_ngrams_flags, VARIATION_NGRAMS_SQL),
    "variation_ngrams_multi": (variation_ngrams_multi, VARIATION_NGRAMS_MULTI_SQL),
}

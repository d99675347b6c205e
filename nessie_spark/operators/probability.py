"""Probability-vector and embedding-space detectors (SURVEY.md §2.2/§2.3/§2.4).

The probability vectors are derived deterministically from the embeddings
table (softmax over the first 4 dimensions) — the engine twin of the
reference's model-produced ``Result.probabilities`` (helper.py:21-28) —
so every scorer below has an exact SQL oracle.

All math is per-row array expressions (whole-stage codegen; zip_with /
aggregate / transform), never Python. Cross-engine float discipline:
identical per-row IEEE double ops, round(·, 6) at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.functions.core import entropy_ln, prob_margin, softmax_arr
from nessie_spark.operators.common import T

# probs = softmax(first 4 dims), noisy label = label % 4
_PROBS_SQL = """
  SELECT vec_id, label % 4 AS noisy,
         list_transform(
           list_transform(e4, x -> exp(x - mx)),
           x -> x / denom) AS probs
  FROM (
    SELECT vec_id, label, e4, list_max(e4) AS mx,
           list_sum(list_transform(e4, x -> exp(x - list_max(e4)))) AS denom
    FROM (SELECT vec_id, label,
                 list_transform(embedding[1:4], v -> CAST(v AS DOUBLE)) AS e4
          FROM embeddings)
  )
"""


def _probs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings")
    e4 = F.transform(F.slice("embedding", 1, 4), lambda v: v.cast("double"))
    return emb.select(
        "vec_id",
        (F.col("label") % 4).alias("noisy"),
        softmax_arr(e4).alias("probs"),
    )


def classification_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClassificationEntropy (/root/reference/nessie/detectors/
    classification_entropy.py:20-31): H(p) per instance, natural log."""
    p = _probs_df(spark, sf_dir)
    return p.select(
        "vec_id", F.round(entropy_ln(F.col("probs")), 6).alias("score")
    ).orderBy("vec_id")


CLASSIFICATION_ENTROPY_SQL = f"""
WITH p AS ({_PROBS_SQL})
SELECT vec_id,
       ROUND(-list_sum(list_transform(probs, x -> CASE WHEN x > 0 THEN x * ln(x) ELSE 0.0 END)), 6) AS score
FROM p ORDER BY vec_id
"""


def prediction_margin_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PredictionMargin (/root/reference/nessie/detectors/
    prediction_margin.py:16-39): 1 − (p_max − p_2nd)."""
    p = _probs_df(spark, sf_dir)
    return p.select(
        "vec_id", F.round(prob_margin(F.col("probs")), 6).alias("score")
    ).orderBy("vec_id")


PREDICTION_MARGIN_SQL = f"""
WITH p AS ({_PROBS_SQL})
SELECT vec_id,
       ROUND(1.0 - (s[-1] - s[-2]), 6) AS score
FROM (SELECT vec_id, list_sort(probs) AS s FROM p)
ORDER BY vec_id
"""


def classification_uncertainty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClassificationUncertainty (/root/reference/nessie/detectors/
    classification_uncertainty.py:25-42): 1 − p[noisy label] — a
    label-indexed gather after the dictionary join."""
    p = _probs_df(spark, sf_dir)
    return p.select(
        "vec_id",
        F.round(1 - F.get("probs", F.col("noisy").cast("int")), 6).alias("score"),
    ).orderBy("vec_id")


CLASSIFICATION_UNCERTAINTY_SQL = f"""
WITH p AS ({_PROBS_SQL})
SELECT vec_id, ROUND(1.0 - probs[CAST(noisy AS INT) + 1], 6) AS score
FROM p ORDER BY vec_id
"""


def ensemble_majority_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MajorityVotingEnsemble (/root/reference/nessie/detectors/
    ensemble.py:10-43): k=3 deterministic 'models' (argmax over embedding
    dim slices) vote; flag label ≠ mode; ``corrected`` = the vote."""
    emb = T(spark, sf_dir, "embeddings")

    def pred(lo: int) -> Column:
        sl = F.transform(F.slice("embedding", lo, 4), lambda v: v.cast("double"))
        return (F.array_position(sl, F.array_max(sl)) - 1).cast("int")

    d = emb.select(
        "vec_id",
        (F.col("label") % 4).alias("noisy"),
        pred(1).alias("p1"),
        pred(5).alias("p2"),
        pred(9).alias("p3"),
    )
    vote = (
        F.when((F.col("p1") == F.col("p2")) | (F.col("p1") == F.col("p3")), F.col("p1"))
        .when(F.col("p2") == F.col("p3"), F.col("p2"))
        .otherwise(F.least("p1", "p2", "p3"))
    )
    return d.select(
        "vec_id",
        "noisy",
        vote.alias("corrected"),
        (vote != F.col("noisy")).alias("flag"),
    ).orderBy("vec_id")


ENSEMBLE_SQL = """
WITH d AS (
  SELECT vec_id, label % 4 AS noisy,
         CAST(list_position(s1, list_max(s1)) - 1 AS INT) AS p1,
         CAST(list_position(s2, list_max(s2)) - 1 AS INT) AS p2,
         CAST(list_position(s3, list_max(s3)) - 1 AS INT) AS p3
  FROM (SELECT vec_id, label,
               list_transform(embedding[1:4],  v -> CAST(v AS DOUBLE)) AS s1,
               list_transform(embedding[5:8],  v -> CAST(v AS DOUBLE)) AS s2,
               list_transform(embedding[9:12], v -> CAST(v AS DOUBLE)) AS s3
        FROM embeddings)
)
SELECT vec_id, noisy,
       CASE WHEN p1 = p2 OR p1 = p3 THEN p1
            WHEN p2 = p3 THEN p2
            ELSE least(p1, p2, p3) END AS corrected,
       (CASE WHEN p1 = p2 OR p1 = p3 THEN p1
             WHEN p2 = p3 THEN p2
             ELSE least(p1, p2, p3) END) != noisy AS flag
FROM d ORDER BY vec_id
"""


def mean_distance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MeanDistance (/root/reference/nessie/detectors/mean_distance.py:25-103):
    per-class centroid, score = squared-euclidean distance of each instance
    to its own class centroid. Spark shape: posexplode → two-level agg →
    broadcast join-back (the J5 pattern), no UDF."""
    emb = T(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    return (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("val") - F.col("c")) ** 2).alias("d2"))
        .select("vec_id", "label", F.round("d2", 6).alias("score"))
        .orderBy("vec_id")
    )


MEAN_DISTANCE_SQL = """
WITH ex AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
), cent AS (
  SELECT label, pos, AVG(val) AS c FROM ex GROUP BY label, pos
)
SELECT ex.vec_id, ex.label, ROUND(SUM((ex.val - cent.c)^2), 6) AS score
FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
GROUP BY ex.vec_id, ex.label
ORDER BY ex.vec_id
"""


def _knn_pairs(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Exact k-NN self-join (brute force): the correctness baseline for
    KnnErrorDetector (/root/reference/nessie/detectors/knn_entropy.py:64-74,
    faiss IndexFlatL2). Scale path = LSH bucketing (similarity.py).
    Ranking ties broken by (round(dist,4), neighbor id) in both engines."""
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda v: v.cast("double")).alias("e")
    )
    a = emb.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"), F.col("e").alias("qe")
    )
    b = emb.select(
        F.col("vec_id").alias("nid"), F.col("label").alias("nlabel"), F.col("e").alias("ne")
    )
    d2 = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.crossJoin(b)
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "qlabel", "nid", "nlabel", F.round(d2, 4).alias("dist"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("nid"))
    return pairs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


_KNN_PAIRS_SQL = """
  SELECT qid, qlabel, nid, nlabel, dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rk
  FROM (
    SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS nid, b.label AS nlabel,
           ROUND(list_sum([ (x[1] - x[2]) * (x[1] - x[2])
                            for x in list_zip(a.e, b.e) ]), 4) AS dist
    FROM (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e FROM embeddings) a
    JOIN (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e FROM embeddings) b
      ON a.vec_id != b.vec_id
  )
"""


def knn_flagger_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KnnFlagger (/root/reference/nessie/detectors/knn_entropy.py:99-150):
    flag = own label ≠ majority label among the k nearest neighbors."""
    nn = _knn_pairs(spark, sf_dir, k=5)
    counts = nn.groupBy("qid", "qlabel", "nlabel").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("qid").orderBy(F.desc("cnt"), F.asc("nlabel"))
    modal = counts.withColumn("mrk", F.row_number().over(w)).where(F.col("mrk") == 1)
    return modal.select(
        F.col("qid").alias("vec_id"),
        F.col("qlabel").alias("label"),
        F.col("nlabel").alias("knn_label"),
        (F.col("qlabel") != F.col("nlabel")).alias("flag"),
    ).orderBy("vec_id")


KNN_FLAGGER_SQL = f"""
WITH nn AS (SELECT * FROM ({_KNN_PAIRS_SQL}) WHERE rk <= 5),
counts AS (
  SELECT qid, qlabel, nlabel, COUNT(*) AS cnt FROM nn GROUP BY qid, qlabel, nlabel
), modal AS (
  SELECT qid, qlabel, nlabel,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cnt DESC, nlabel ASC) AS mrk
  FROM counts
)
SELECT qid AS vec_id, qlabel AS label, nlabel AS knn_label,
       qlabel != nlabel AS flag
FROM modal WHERE mrk = 1 ORDER BY vec_id
"""


def knn_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KnnEntropy (/root/reference/nessie/detectors/knn_entropy.py:16-96):
    entropy of the neighbor-label distribution among the k nearest
    (count-based p = c/k — exact rationals, identical across engines)."""
    nn = _knn_pairs(spark, sf_dir, k=5)
    counts = nn.groupBy("qid", "nlabel").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("qid")
        .agg(
            F.round(
                -F.sum((F.col("cnt") / 5.0) * F.log(F.col("cnt") / 5.0)), 6
            ).alias("score")
        )
        .select(F.col("qid").alias("vec_id"), "score")
        .orderBy("vec_id")
    )


KNN_ENTROPY_SQL = f"""
WITH nn AS (SELECT * FROM ({_KNN_PAIRS_SQL}) WHERE rk <= 5),
counts AS (SELECT qid, nlabel, COUNT(*) AS cnt FROM nn GROUP BY qid, nlabel)
SELECT qid AS vec_id, ROUND(-SUM((cnt / 5.0) * ln(cnt / 5.0)), 6) AS score
FROM counts GROUP BY qid ORDER BY vec_id
"""


QUERIES: dict[str, tuple] = {
    "classification_entropy_scores": (classification_entropy_scores, CLASSIFICATION_ENTROPY_SQL),
    "prediction_margin_scores": (prediction_margin_scores, PREDICTION_MARGIN_SQL),
    "classification_uncertainty_scores": (
        classification_uncertainty_scores,
        CLASSIFICATION_UNCERTAINTY_SQL,
    ),
    "ensemble_majority_flags": (ensemble_majority_flags, ENSEMBLE_SQL),
    "mean_distance_scores": (mean_distance_scores, MEAN_DISTANCE_SQL),
    "knn_flagger_flags": (knn_flagger_flags, KNN_FLAGGER_SQL),
    "knn_entropy_scores": (knn_entropy_scores, KNN_ENTROPY_SQL),
}

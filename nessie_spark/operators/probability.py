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


def _centroid_arrays(emb: DataFrame) -> DataFrame:
    """Per-label centroid as an ordered array<double> column ``cvec``.

    Shape: posexplode → groupBy(label, pos) avg — map-side partial
    aggregation shrinks the shuffle to n_partitions × n_labels × 64 rows
    (tiny) — then collect_list re-assembled in pos order. The result is a
    n_labels-row frame, always broadcastable."""
    ex = emb.select(
        "label", F.posexplode(F.col("e")).alias("pos", "val")
    )
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    return (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("ps"))
        .select("label", F.transform("ps", lambda s: s["c"]).alias("cvec"))
    )


def _emb_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda v: v.cast("double")).alias("e")
    )


_CENT_SQL = """
ex AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
), cent AS (
  SELECT label, pos, AVG(val) AS c FROM ex GROUP BY label, pos
), cvecs AS (
  SELECT label, list(c ORDER BY pos) AS cvec FROM cent GROUP BY label
), emb AS (
  SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
  FROM embeddings
), joined AS (
  SELECT emb.vec_id, emb.label, emb.e, cvecs.cvec
  FROM emb JOIN cvecs USING (label)
)
"""


def mean_distance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MeanDistance (/root/reference/nessie/detectors/mean_distance.py:25-103):
    per-class centroid, score = euclidean distance of each instance to its
    own class centroid (scipy.spatial.distance.euclidean, mean_distance.py:63).

    Physical plan (r2): the tiny per-label centroid-ARRAY frame broadcasts
    and the distance is one ordered ``zip_with``/``aggregate`` fold per row
    — no N-row join-back + re-aggregation shuffle (r1 pushed 64×N rows
    through a second shuffle). The ordered fold is also float-safer than a
    group-sum: both engines add in pos order."""
    emb = _emb_labeled(spark, sf_dir)
    d2 = F.aggregate(
        F.zip_with("e", "cvec", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return (
        emb.join(F.broadcast(_centroid_arrays(emb)), "label")
        .select("vec_id", "label", F.round(F.sqrt(d2), 6).alias("score"))
        .orderBy("vec_id")
    )


MEAN_DISTANCE_SQL = f"""
WITH {_CENT_SQL}
SELECT vec_id, label,
       ROUND(sqrt(list_sum([ (x[1] - x[2]) * (x[1] - x[2]) for x in list_zip(e, cvec) ])), 6) AS score
FROM joined ORDER BY vec_id
"""


def mean_distance_cosine_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MeanDistance(metric='cosine') (mean_distance.py:65-66 →
    scipy.spatial.distance.cosine): score = 1 − e·c / (|e||c|)."""
    from nessie_spark.functions.core import cosine_sim

    emb = _emb_labeled(spark, sf_dir)
    return (
        emb.join(F.broadcast(_centroid_arrays(emb)), "label")
        .select(
            "vec_id",
            "label",
            F.round(F.lit(1.0) - cosine_sim(F.col("e"), F.col("cvec")), 6).alias("score"),
        )
        .orderBy("vec_id")
    )


MEAN_DISTANCE_COSINE_SQL = f"""
WITH {_CENT_SQL}
SELECT vec_id, label,
       ROUND(1.0 - list_sum([ x[1] * x[2] for x in list_zip(e, cvec) ])
             / (sqrt(list_sum([ y * y for y in e ])) * sqrt(list_sum([ z * z for z in cvec ]))),
             6) AS score
FROM joined ORDER BY vec_id
"""


def mean_distance_dot_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MeanDistance(metric='dot') (mean_distance.py:68-70): score = −e·c."""
    emb = _emb_labeled(spark, sf_dir)
    dot = F.aggregate(
        F.zip_with("e", "cvec", lambda x, c: x * c), F.lit(0.0), lambda a, v: a + v
    )
    return (
        emb.join(F.broadcast(_centroid_arrays(emb)), "label")
        .select("vec_id", "label", F.round(-dot, 6).alias("score"))
        .orderBy("vec_id")
    )


MEAN_DISTANCE_DOT_SQL = f"""
WITH {_CENT_SQL}
SELECT vec_id, label,
       ROUND(-list_sum([ x[1] * x[2] for x in list_zip(e, cvec) ]), 6) AS score
FROM joined ORDER BY vec_id
"""


LOF_K = 20  # sklearn LocalOutlierFactor default n_neighbors
LOF_RESCUE_FACTOR = 1.1  # round-2 exact rescue when kdist > factor × class median


def mean_distance_lof_scores(spark: SparkSession, sf_dir: str, k: int = LOF_K) -> DataFrame:
    """MeanDistance(metric='lof') (mean_distance.py:95-103): per-class
    LocalOutlierFactor, score = −negative_outlier_factor_ (≈1 inliers,
    ≫1 outliers). Fully distributed (r2 VERDICT #4 — the former per-class
    dense n×n grouped map OOMs one executor on a popular class at scale;
    it survives as the pytest twin ``mean_distance_lof_scores_dense``):

    1. within-class candidate pairs via the sign-LSH banded self-join
       (same family as _knn_pairs, label added to the band key);
    2. **count rescue**: points with < k candidates (LSH-isolated —
       exactly the outliers LOF must score) get exact within-class
       neighbors via a join of the (few) poor points against their class —
       totality guaranteed, cost bounded by |poor|·|class|;
    3. **suspect rescue**: a candidate-based k-distance is an upper bound,
       and when a point's close candidates are sparse its kdist can jump
       to a far candidate — one such inflated kdist poisons every
       in-neighbor's reachability. Points whose round-1 kdist exceeds
       LOF_RESCUE_FACTOR × their class's median kdist are re-candidated
       exactly (same bounded join); the rest keep candidate sets whose
       kdist error is ≤ the factor, bounding the lrd error;
    4. k-distance, tie-inclusive neighborhoods, reachability, lrd, and the
       LOF ratio as four groupBy/join steps over the pair table — no dense
       matrix anywhere, every shuffle keyed on vec ids.

    k-distance neighborhoods INCLUDE ties at the k-th distance (Breunig
    et al. 2000 / sklearn). No SQL oracle (neighborhood logic; driver
    records rows-only) — golden + dense-twin parity tests in
    tests/test_lof.py."""
    from nessie_spark.operators.similarity import band_keys_udf

    emb = _emb_labeled(spark, sf_dir)
    class_n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("_cn"))

    banded = emb.select(
        "vec_id", "label",
        F.posexplode(band_keys_udf(KNN_BANDS, KNN_PLANES)(F.col("e"))).alias("band", "bk"),
    )
    cand_ids = (
        banded.select(F.col("vec_id").alias("qid"), "label", "band", "bk")
        .join(banded.select(F.col("vec_id").alias("nid"), "label", "band", "bk"),
              ["label", "band", "bk"])
        .where(F.col("qid") != F.col("nid"))
        .select("label", "qid", "nid")
        .dropDuplicates(["qid", "nid"])
    )
    # rescue: every point must end with ≥ min(k, class_n−1) candidates
    rich = (
        cand_ids.groupBy("qid").agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= k)
        .select("qid")
    )
    poor = emb.select(F.col("vec_id").alias("qid"), "label").join(rich, "qid", "left_anti")
    rescue = (
        poor.join(emb.select(F.col("vec_id").alias("nid"), "label"), "label")
        .where(F.col("qid") != F.col("nid"))
        .select("label", "qid", "nid")
    )
    cand_ids = cand_ids.unionByName(rescue).dropDuplicates(["qid", "nid"])

    # round 1: candidate-based kdist → suspects = kdist above the class
    # median by more than the rescue factor (exact distributed median:
    # ids+doubles only, one window per class)
    kd1 = _lof_ranked_pairs(emb, class_n, cand_ids, k).groupBy("label", "qid").agg(
        F.max("kdist").alias("kdist_q")
    )
    wmed = Window.partitionBy("label").orderBy(F.asc("kdist_q"), F.asc("qid"))
    wcls = Window.partitionBy("label")
    med = (
        kd1.withColumn("_mrn", F.row_number().over(wmed))
        .withColumn("_mcnt", F.count(F.lit(1)).over(wcls))
        .where(F.col("_mrn") == F.ceil(F.col("_mcnt") / 2))
        .select("label", F.col("kdist_q").alias("med_kdist"))
    )
    suspects = (
        kd1.join(med, "label")
        .where(F.col("kdist_q") > LOF_RESCUE_FACTOR * F.col("med_kdist"))
        .select("label", "qid")
    )
    s_rescue = (
        suspects.join(emb.select(F.col("vec_id").alias("nid"), "label"), "label")
        .where(F.col("qid") != F.col("nid"))
        .select("label", "qid", "nid")
    )
    cand_ids = cand_ids.unionByName(s_rescue).dropDuplicates(["qid", "nid"])
    return _lof_from_candidates(emb, class_n, cand_ids, k)


def _lof_ranked_pairs(
    emb: DataFrame, class_n: DataFrame, cids: DataFrame, k: int
) -> DataFrame:
    """(label, qid, nid) candidate ids → scored pairs with per-qid rank and
    candidate-based k-distance (ties beyond rank k keep the kdist value)."""
    d2 = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        cids.join(
            emb.select(F.col("vec_id").alias("qid"), F.col("e").alias("qe")), "qid"
        )
        .join(emb.select(F.col("vec_id").alias("nid"), F.col("e").alias("ne")), "nid")
        .select("label", "qid", "nid", F.sqrt(d2).alias("dist"))
        .join(F.broadcast(class_n), "label")
        .withColumn("_k", F.least(F.lit(k), F.col("_cn") - 1))
    )
    wq = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("nid"))
    wall = Window.partitionBy("qid")
    return pairs.withColumn("rn", F.row_number().over(wq)).withColumn(
        "kdist", F.max(F.when(F.col("rn") <= F.col("_k"), F.col("dist"))).over(wall)
    )


def _lof_from_candidates(
    emb: DataFrame, class_n: DataFrame, cand_ids: DataFrame, k: int
) -> DataFrame:
    """The LOF tail shared by the LSH-candidate query and the exact-baseline
    query: k-distance / tie-inclusive neighborhoods / reachability / lrd /
    LOF ratio, all as joins over the candidate pair table."""
    ranked = _lof_ranked_pairs(emb, class_n, cand_ids, k)
    nb = ranked.where(F.col("dist") <= F.col("kdist")).select(
        "label", "qid", "nid", "dist", "kdist"
    )
    kd = nb.groupBy("qid").agg(F.max("kdist").alias("kdist_q"))
    reach = nb.join(
        kd.select(F.col("qid").alias("nid"), F.col("kdist_q").alias("kdist_n")), "nid"
    ).select("qid", "nid", F.greatest("kdist_n", "dist").alias("reach"))
    lrd = reach.groupBy("qid").agg(
        (F.count(F.lit(1)) / F.sum("reach")).alias("lrd")
    )
    lof = (
        nb.join(lrd.select(F.col("qid").alias("nid"), F.col("lrd").alias("lrd_n")), "nid")
        .groupBy("qid")
        .agg(F.avg("lrd_n").alias("avg_lrd_n"))
        .join(lrd, "qid")
        .select("qid", (F.col("avg_lrd_n") / F.col("lrd")).alias("lof"))
    )
    return (
        emb.select("vec_id", "label")
        # LEFT join: a point in a singleton class has no within-class
        # neighbors and no defined LOF — it keeps a NULL score instead of
        # silently vanishing from the output (the dense twin mirrors this)
        .join(lof.select(F.col("qid").alias("vec_id"), "lof"), "vec_id", "left")
        .select("vec_id", "label", F.round("lof", 6).alias("score"))
        .orderBy("vec_id")
    )


def mean_distance_lof_exact_scores(
    spark: SparkSession, sf_dir: str, k: int = LOF_K
) -> DataFrame:
    """Exact per-class LOF as a shipped, ORACLE-BACKED query — the
    correctness baseline beside the LSH-candidate scale path above (the
    same exact-vs-approximate pairing the engine ships for kNN:
    ``knn_exact_topk`` / ``knn_flagger_flags``, and for ANN:
    ``ann_cosine_topk`` / ``ann_lsh_topk``). Candidates = ALL within-class
    pairs via a label equi-join — one shuffle keyed on label, cost bounded
    by Σ|class|², so it is the small/medium-class answer; at 10^9 rows with
    hot classes use ``mean_distance_lof_scores`` (banded candidates + exact
    rescue). Reference: mean_distance.py:95-103 (sklearn
    LocalOutlierFactor, score = −negative_outlier_factor_)."""
    emb = _emb_labeled(spark, sf_dir)
    class_n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("_cn"))
    ids = emb.select("vec_id", "label")
    cand_ids = (
        ids.select(F.col("vec_id").alias("qid"), "label")
        .join(ids.select(F.col("vec_id").alias("nid"), "label"), "label")
        .where(F.col("qid") != F.col("nid"))
        .select("label", "qid", "nid")
    )
    return _lof_from_candidates(emb, class_n, cand_ids, k)


def mean_distance_lof_scores_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-class LOF — the pytest twin of the distributed query
    above (exact n×n per class; NOT shipped as a query: one task and O(n²)
    memory per class)."""
    import numpy as np
    import pandas as pd

    emb = _emb_labeled(spark, sf_dir)

    def _lof(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(pdf["e"].to_numpy())  # (n, d)
        n = len(X)
        if n == 1:
            # singleton class: LOF undefined → NULL score (matches the
            # distributed query's left-join semantics)
            return pd.DataFrame(
                {"vec_id": pdf["vec_id"], "label": pdf["label"],
                 "score": [None]}
            )
        k = min(LOF_K, n - 1)
        # pairwise euclidean distances
        sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        D = np.sqrt(np.maximum(sq, 0.0))
        np.fill_diagonal(D, np.inf)
        order = np.argsort(D, axis=1)
        kdist = D[np.arange(n), order[:, k - 1]]  # k-th NN distance
        # neighborhoods: all points within k-distance (ties included)
        lrd = np.empty(n)
        neigh: list[np.ndarray] = []
        for i in range(n):
            Ni = np.where(D[i] <= kdist[i])[0]
            neigh.append(Ni)
            reach = np.maximum(kdist[Ni], D[i, Ni])
            lrd[i] = len(Ni) / reach.sum()
        lof = np.array([lrd[neigh[i]].mean() / lrd[i] for i in range(n)])
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy(),
                "label": pdf["label"].to_numpy(),
                "score": np.round(lof, 6),
            }
        )

    return (
        emb.groupBy("label")
        .applyInPandas(_lof, "vec_id long, label int, score double")
        .orderBy("vec_id")
    )


MEAN_DISTANCE_LOF_EXACT_SQL = """
WITH ex AS (
  SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
  FROM embeddings
), cn AS (
  SELECT label, COUNT(*) AS _cn FROM ex GROUP BY label
), pairs AS (
  SELECT a.label, a.vec_id AS qid, b.vec_id AS nid,
         sqrt(list_sum([ (x[1] - x[2]) * (x[1] - x[2])
                         for x in list_zip(a.e, b.e) ])) AS dist
  FROM ex a JOIN ex b ON a.label = b.label AND a.vec_id <> b.vec_id
), ranked AS (
  SELECT p.qid, p.nid, p.dist, LEAST(20, c._cn - 1) AS _k,
         ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY p.dist ASC, p.nid ASC) AS rn
  FROM pairs p JOIN cn c USING (label)
), kd AS (
  SELECT qid, MAX(CASE WHEN rn <= _k THEN dist END) AS kdist
  FROM ranked GROUP BY qid
), nb AS (
  SELECT r.qid, r.nid, r.dist, k.kdist
  FROM ranked r JOIN kd k USING (qid)
  WHERE r.dist <= k.kdist
), reach AS (
  SELECT nb.qid, GREATEST(kn.kdist, nb.dist) AS reach
  FROM nb JOIN kd kn ON nb.nid = kn.qid
), lrd AS (
  SELECT qid, COUNT(*) / SUM(reach) AS lrd FROM reach GROUP BY qid
), lofn AS (
  SELECT nb.qid, AVG(ln.lrd) AS avg_lrd_n
  FROM nb JOIN lrd ln ON nb.nid = ln.qid
  GROUP BY nb.qid
)
SELECT ex.vec_id, ex.label, ROUND(lofn.avg_lrd_n / lq.lrd, 6) AS score
FROM ex
LEFT JOIN lofn ON ex.vec_id = lofn.qid
LEFT JOIN lrd lq ON ex.vec_id = lq.qid
ORDER BY vec_id
"""


KNN_BANDS, KNN_PLANES = 16, 5  # 2^5 buckets/band; every fixture point keeps ≥5 candidates


def _knn_pairs_exact(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Exact k-NN self-join (brute force): the correctness baseline for
    KnnErrorDetector (/root/reference/nessie/detectors/knn_entropy.py:64-74,
    faiss IndexFlatL2). Kept ONLY as the pytest oracle twin — it is O(N²)
    (CartesianProduct); the shipped queries use _knn_pairs (LSH candidates).
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
        _knn_exact_candidates(spark, emb, k)
        .join(F.broadcast(a), "qid")
        .join(F.broadcast(b), "nid")
        .select("qid", "qlabel", "nid", "nlabel", F.round(d2, 4).alias("dist"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("nid"))
    return pairs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


# brute-force memory bar: beyond this the broadcast index itself is the
# problem and the LSH/IVF queries are the answer — refuse, don't thrash
KNN_BRUTE_MAX_VECTORS = 1_000_000
KNN_EXACT_CAND_MULT = 6  # candidates per query = max(32, MULT*k)


def _knn_exact_candidates(spark: SparkSession, emb: DataFrame, k: int) -> DataFrame:
    """Vectorized retrieve stage for the brute-force baseline: one BLAS
    distance-matrix block per Arrow batch against a broadcast copy of ALL
    vectors, keeping the top max(32, 6k) candidate ids per query.

    The exact scoring (the interpreted Spark fold, bit-identical to the
    DuckDB oracle) then runs only on N×candidates pairs instead of N² —
    measured 34 s → ~2 s at sf0.1. The float64 matmul ranks candidates
    with ~1e-12 relative error while the margin is 27 extra candidates, so
    the true top-k always survives the cut; scoring order/rounding is
    untouched. The broadcast is O(N·d) doubles — the SAME residency a
    faiss IndexFlatL2 needs on one node (knn_entropy.py:64-74), which is
    what this query is the parity baseline for; it refuses past
    KNN_BRUTE_MAX_VECTORS where the LSH (_knn_pairs) and IVF paths are the
    documented scale answers. The collect here is the index build, not a
    result materialization."""
    import numpy as np
    import pandas as pd

    rows = emb.select("vec_id", "e").collect()
    if len(rows) > KNN_BRUTE_MAX_VECTORS:
        raise ValueError(
            f"knn_exact_topk is the brute-force baseline (O(N²)); "
            f"N={len(rows)} exceeds {KNN_BRUTE_MAX_VECTORS}. Use the LSH "
            "knn_* queries or ann_ivf_topk at this scale."
        )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.e for r in rows], dtype=np.float64)
    sq = (mat * mat).sum(axis=1)
    bc = spark.sparkContext.broadcast((ids, mat, sq))
    n_cand = max(32, KNN_EXACT_CAND_MULT * k)

    def _cands(batches):
        b_ids, b_mat, b_sq = bc.value
        top = min(n_cand, len(b_ids) - 1)
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf["e"]), dtype=np.float64)
            qid = pdf["qid"].to_numpy()
            # ||q−n||² = ||q||² + ||n||² − 2 q·n (rank-only; the exact fold
            # re-scores every surviving pair)
            d = (q * q).sum(axis=1)[:, None] + b_sq[None, :] - 2.0 * (q @ b_mat.T)
            out_q, out_n = [], []
            for i in range(len(qid)):
                d[i, b_ids == qid[i]] = np.inf  # exclude self
                # tie-safe cut: the final contract ranks by
                # (round(dist,4), nid), so every vector whose ROUNDED
                # distance could equal the k-th's must survive — take
                # everything within one rounding bucket (1e-4) of the k-th
                # smallest raw distance (matmul-vs-fold error is ~1e-12,
                # orders below the slack). The fixed top-N margin alone
                # could drop the smallest-nid member of a boundary tie.
                if len(b_ids) < 2:  # only the query itself exists
                    continue
                kth = np.partition(d[i], min(k, len(b_ids) - 1) - 1)[
                    min(k, len(b_ids) - 1) - 1
                ]
                idx = np.flatnonzero(d[i] <= kth + 1e-4)
                if len(idx) < top:  # keep the wide margin too (cheap)
                    idx = np.argpartition(d[i], top)[: top + 1]
                # the self entry is +inf — it can slip past either cut when
                # every distance ties at the threshold or N is tiny; a
                # superset of candidates is always safe, self never is
                idx = idx[np.isfinite(d[i][idx])]
                out_q.append(np.full(len(idx), qid[i], dtype=np.int64))
                out_n.append(b_ids[idx])
            yield pd.DataFrame(
                {"qid": np.concatenate(out_q), "nid": np.concatenate(out_n)}
            )

    # the testdata ships one parquet file per table — spread the query side
    # so the matmul blocks use every core (same rationale as dedup._spread)
    q_side = emb.select(F.col("vec_id").alias("qid"), "e").repartition(
        2 * spark.sparkContext.defaultParallelism
    )
    return q_side.mapInPandas(_cands, "qid long, nid long")


# The four knn_* registry queries share the banded-candidates subplan
# byte-for-byte; without reuse each query recomputes the LSH band join from
# the parquet scan (the same multi-consumer recompute the dedup ops fixed in
# r3 with localCheckpoint). Memoized per (application, sf_dir, k): the first
# query materializes the pairs once (localCheckpoint → block manager), the
# other three read the checkpointed partitions. Keyed by applicationId so a
# stopped/restarted session never sees a stale frame.
_KNN_PAIRS_MEMO: dict[tuple, DataFrame] = {}


def _knn_pairs(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, k)
    hit = _KNN_PAIRS_MEMO.get(key)
    if hit is not None:
        return hit
    nn = _knn_pairs_build(spark, sf_dir, k).localCheckpoint(eager=False)
    if len(_KNN_PAIRS_MEMO) > 32:  # dead-session entries; bounded anyway
        _KNN_PAIRS_MEMO.clear()
    _KNN_PAIRS_MEMO[key] = nn
    return nn


def _knn_pairs_build(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """k-NN pairs, LSH-bucketed (the 10^9-row shape — r1's crossJoin was a
    scale-killer): random-hyperplane sign bands → one exploded (band, key)
    equi-join for candidates → exact L2 on candidates → top-k. The fixture
    embeddings are unit-norm, so d² = 2−2·cos and sign-LSH (a cosine
    family) is the correct bucketing for L2 too. The oracle computes the
    SAME banded candidate set, so the gate is exact; approximate-kNN recall
    (top-5 ≈ 0.76 on the near-uniform synthetic fixture, higher on real
    clustered data) is the standard LSH contract — the exact twin stays in
    _knn_pairs_exact for pytest comparison.

    Candidate pairs appearing in several bands are deduped on (qid, nid)
    BEFORE ranking — a duplicated neighbor would occupy two top-k slots."""
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda v: v.cast("double")).alias("e")
    )
    return knn_pairs_from(emb, k)


def knn_pairs_from(emb: DataFrame, k: int = 5) -> DataFrame:
    """LSH-bucketed k-NN pairs over any (vec_id, label, e: array<double>)
    frame — the generic core of ``_knn_pairs`` (also the engine behind the
    ``api.KnnFlagger``/``api.KnnEntropy`` facade).

    Physical plan: bucket-LOCAL top-k. Vectors ride the band explode once
    (16n rows of id+label+vector, one hash exchange on (band, key)); each
    bucket computes its pairwise d² with a vectorized grouped map and
    emits, per query row, the pairs that can still reach the global top-k
    — only (qid, nid, d²) SCALARS hit the dedup/rank shuffle. The r3 plan
    kept the explode id-only but then shuffled every candidate pair for
    dedup and joined the 64-double arrays back per pair side: candidate
    count grows ~n²/buckets (1.6M pairs from 2k vectors at sf0.1), so the
    pair-keyed array join-back dominated (~1.6 GB of shuffle) and the
    interpreted HOF d² ran per pair. Measured 6.2 s → 1.3 s at sf0.1;
    at 10^9 rows the old shape is quadratic bytes, this one is 16n plus
    the true top-k output.

    Exactness (the oracle ranks by (ROUND(d², 4), nid) over the SAME
    banded candidate set): (1) d² accumulates dimension-by-dimension, the
    identical left-fold order as DuckDB's list_sum and the old
    F.aggregate, so values are bit-equal and F.round stays cross-engine
    safe; (2) each bucket keeps every pair within +1e-4 (one rounding
    quantum) of its k-th smallest raw d² — a pair beyond that slack is
    strictly outranked by k same-bucket pairs even after rounding, so the
    kept union is a provable superset of the global top-k and the final
    Spark-side round+rank selects exactly the old rows.

    Bucket width is the knob: expected rows/bucket = n / 2^KNN_PLANES, and
    per-bucket work is width² — at larger corpora raise KNN_PLANES with
    log₂(n) to hold bucket width ~O(100) (recall is then retuned via
    KNN_BANDS); the constants here are sized for the gate fixtures."""
    from pyspark.sql import functions as F

    from nessie_spark.operators.similarity import band_keys_udf

    banded = emb.select(
        "vec_id", "label", "e",
        F.posexplode(band_keys_udf(KNN_BANDS, KNN_PLANES)(F.col("e"))).alias("band", "bk"),
    )

    def bucket_topk(pdf):
        import numpy as np
        import pandas as pd

        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                columns=["qid", "qlabel", "nid", "nlabel", "dist"]
            ).astype({"qid": "int64", "qlabel": "int32", "nid": "int64",
                      "nlabel": "int32", "dist": "float64"})
        X = np.vstack(pdf["e"].to_numpy()).astype(np.float64, copy=False)
        D = np.zeros((m, m), dtype=np.float64)
        # dim-by-dim accumulation == the sequential fold over zip_with in
        # the old Catalyst expression AND DuckDB's list_sum — bit-equal d²
        for j in range(X.shape[1]):
            c = X[:, j]
            d = c[:, None] - c[None, :]
            D += d * d
        np.fill_diagonal(D, np.inf)
        kth = np.partition(D, min(k - 1, m - 2), axis=1)[:, min(k - 1, m - 2)]
        rows, cols = np.nonzero(D <= (kth[:, None] + 1e-4))
        vid = pdf["vec_id"].to_numpy()
        lab = pdf["label"].to_numpy()
        return pd.DataFrame(
            {
                "qid": vid[rows],
                "qlabel": lab[rows],
                "nid": vid[cols],
                "nlabel": lab[cols],
                "dist": D[rows, cols],
            }
        )

    local = banded.groupBy("band", "bk").applyInPandas(
        bucket_topk,
        schema="qid long, qlabel int, nid long, nlabel int, dist double",
    )
    pairs = local.dropDuplicates(["qid", "nid"]).select(
        "qid", "qlabel", "nid", "nlabel", F.round("dist", 4).alias("dist")
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("nid"))
    return pairs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def _knn_pairs_sql() -> str:
    from nessie_spark.operators.similarity import planes_sql

    band_eq = " OR ".join(f"a.band{b} = b.band{b}" for b in range(KNN_BANDS))
    return f"""
  SELECT qid, qlabel, nid, nlabel, dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rk
  FROM (
    SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS nid, b.label AS nlabel,
           ROUND(list_sum([ (x[1] - x[2]) * (x[1] - x[2])
                            for x in list_zip(a.e, b.e) ]), 4) AS dist
    FROM (SELECT vec_id, label, e, {planes_sql(KNN_BANDS, KNN_PLANES)}
          FROM (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
                FROM embeddings)) a
    JOIN (SELECT vec_id, label, e, {planes_sql(KNN_BANDS, KNN_PLANES)}
          FROM (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
                FROM embeddings)) b
      ON a.vec_id != b.vec_id AND ({band_eq})
  )
"""


_KNN_PAIRS_SQL = _knn_pairs_sql()


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
    # p = c / (actual neighborhood size), NOT c/k: an LSH-isolated point
    # with fewer than k candidates must still see a proper distribution
    # (reference semantics normalize over the returned neighbors)
    return (
        counts.groupBy("qid")
        .agg(
            F.sum("cnt").alias("tot"),
            (-F.sum(F.col("cnt") * F.log("cnt"))).alias("_nlogn"),
        )
        .select(
            F.col("qid").alias("vec_id"),
            F.round(
                F.col("_nlogn") / F.col("tot") + F.log("tot"), 6
            ).alias("score"),
        )
        .orderBy("vec_id")
    )


KNN_ENTROPY_SQL = f"""
WITH nn AS (SELECT * FROM ({_KNN_PAIRS_SQL}) WHERE rk <= 5),
counts AS (SELECT qid, nlabel, COUNT(*) AS cnt FROM nn GROUP BY qid, nlabel),
ent AS (
  SELECT qid, SUM(cnt) AS tot,
         0.0 - SUM(cnt * ln(cnt)) AS nlogn
  FROM counts GROUP BY qid
)
SELECT qid AS vec_id, ROUND(nlogn / tot + ln(tot), 6) AS score
FROM ent ORDER BY vec_id
"""


def _knn_softmax_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-softmax label distribution over the k nearest neighbors —
    Eq. 2 of the kNN-LM interpolation as grafted by the reference
    (/root/reference/nessie/detectors/knn_entropy.py:99-150, logsumexp
    form): P(c) = Σ_{i: label_i=c} e^{−d_i} / Σ_i e^{−d_i}.

    Float discipline: neighbors are folded in rank order from a sorted
    array; the max-shift (min distance) cancels exactly in the ratio; class
    sums add a literal 0.0 for non-matching slots so both engines perform
    the identical ordered float adds. Returns (vec_id, label, probs[10] —
    the full embeddings label domain)."""
    nn = _knn_pairs(spark, sf_dir, k=5)
    agg = nn.groupBy(
        F.col("qid").alias("vec_id"), F.col("qlabel").alias("label")
    ).agg(F.array_sort(F.collect_list(F.struct("rk", "dist", "nlabel"))).alias("arr"))
    dists = F.transform("arr", lambda s: s["dist"])
    labs = F.transform("arr", lambda s: s["nlabel"])
    m = F.array_min(dists)
    sc = F.transform(
        # the raw embeddings label domain is [0, 10) — the neighborhood
        # distribution must cover it (a 4-class truncation would zero the
        # probs of every point labeled >= 4 and unconditionally flag it)
        F.sequence(F.lit(0), F.lit(9)),
        lambda c: F.aggregate(
            F.zip_with(dists, labs, lambda d, l: F.when(l == c, F.exp(m - d)).otherwise(F.lit(0.0))),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
    )
    S = F.aggregate(
        F.transform(dists, lambda d: F.exp(m - d)), F.lit(0.0), lambda a, v: a + v
    )
    return agg.select(
        "vec_id", "label", F.transform(sc, lambda s: s / S).alias("probs")
    )


_KNN_SOFTMAX_SQL_BODY = f"""
nn AS (SELECT * FROM ({{pairs}}) WHERE rk <= 5),
agg AS (
  SELECT qid AS vec_id, qlabel AS label,
         list(dist ORDER BY rk) AS dists,
         list(nlabel ORDER BY rk) AS labs
  FROM nn GROUP BY qid, qlabel
),
sm AS (
  SELECT vec_id, label, dists, labs, list_min(dists) AS m,
         list_sum(list_transform(dists, d -> exp(list_min(dists) - d))) AS s
  FROM agg
),
probs AS (
  SELECT vec_id, label,
         list_transform([0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
           c -> list_sum(list_transform(list_zip(dists, labs),
                  t -> CASE WHEN t[2] = c THEN exp(m - t[1]) ELSE 0.0 END)) / s) AS p
  FROM sm
)
"""


def knn_softmax_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KnnEntropy with the distance-softmax interpolation
    (knn_entropy.py:16-96 + 99-150): entropy of P_knn instead of the
    count-based c/k distribution."""
    from nessie_spark.functions.core import entropy_ln

    p = _knn_softmax_probs(spark, sf_dir)
    return p.select(
        "vec_id", F.round(entropy_ln(F.col("probs")), 6).alias("score")
    ).orderBy("vec_id")


KNN_SOFTMAX_ENTROPY_SQL = f"""
WITH {_KNN_SOFTMAX_SQL_BODY.format(pairs=_KNN_PAIRS_SQL)}
SELECT vec_id,
       -- 0.0 -  (not unary minus): a one-label neighborhood sums to 0.0 and
       -- -0.0 would hash-differ from Spark's +0.0 fold
       ROUND(0.0 - list_sum(list_transform(p,
             x -> CASE WHEN x > 0 THEN x * ln(x) ELSE 0.0 END)), 6) AS score
FROM probs ORDER BY vec_id
"""


def knn_softmax_flagger_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KnnFlagger under the distance-softmax distribution
    (knn_entropy.py:90-96): flag = own label ≠ argmax_c P_knn(c); argmax
    ties break to the smallest class (first max position) in both engines."""
    p = _knn_softmax_probs(spark, sf_dir)
    knn_label = (F.array_position("probs", F.array_max("probs")) - 1).cast("int")
    return p.select(
        "vec_id",
        "label",
        knn_label.alias("knn_label"),
        (F.col("label") != knn_label).alias("flag"),
    ).orderBy("vec_id")


KNN_SOFTMAX_FLAGGER_SQL = f"""
WITH {_KNN_SOFTMAX_SQL_BODY.format(pairs=_KNN_PAIRS_SQL)}
SELECT vec_id, label,
       CAST(list_position(p, list_max(p)) - 1 AS INT) AS knn_label,
       label != CAST(list_position(p, list_max(p)) - 1 AS INT) AS flag
FROM probs ORDER BY vec_id
"""


def knn_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN as a first-class registry query — the reference's DEFAULT
    kNN path (/root/reference/nessie/detectors/knn_entropy.py:64-74 builds a
    faiss IndexFlatL2: exact L2, all-vs-all). The shipped knn_* detectors
    use the LSH-bucketed candidates because all-pairs is the 10^9-row
    scale-killer; this query is the exact correctness baseline (same role
    as ann_cosine_topk for similarity search), O(N²) by construction and
    documented as such. Ties break by (round(dist,4), nid) in both engines."""
    nn = _knn_pairs_exact(spark, sf_dir, k=5)
    return nn.select(
        F.col("qid").alias("vec_id"),
        F.col("qlabel").alias("label"),
        "rk",
        "nid",
        "nlabel",
        "dist",
    ).orderBy("vec_id", "rk")


KNN_EXACT_TOPK_SQL = """
WITH emb AS (
  SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS nid, b.label AS nlabel,
         ROUND(list_sum([ (x[1] - x[2]) * (x[1] - x[2])
                          for x in list_zip(a.e, b.e) ]), 4) AS dist
  FROM emb a JOIN emb b ON a.vec_id != b.vec_id
), ranked AS (
  SELECT qid, qlabel, nid, nlabel, dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rk
  FROM pairs
)
SELECT qid AS vec_id, qlabel AS label, rk, nid, nlabel, dist
FROM ranked WHERE rk <= 5 ORDER BY vec_id, rk
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
    "mean_distance_cosine_scores": (mean_distance_cosine_scores, MEAN_DISTANCE_COSINE_SQL),
    "mean_distance_dot_scores": (mean_distance_dot_scores, MEAN_DISTANCE_DOT_SQL),
    "mean_distance_lof_scores": (mean_distance_lof_scores, None),  # rows-only (see docstring)
    "mean_distance_lof_exact_scores": (
        mean_distance_lof_exact_scores,
        MEAN_DISTANCE_LOF_EXACT_SQL,
    ),
    "knn_flagger_flags": (knn_flagger_flags, KNN_FLAGGER_SQL),
    "knn_entropy_scores": (knn_entropy_scores, KNN_ENTROPY_SQL),
    "knn_softmax_entropy_scores": (knn_softmax_entropy_scores, KNN_SOFTMAX_ENTROPY_SQL),
    "knn_softmax_flagger_flags": (knn_softmax_flagger_flags, KNN_SOFTMAX_FLAGGER_SQL),
    "knn_exact_topk": (knn_exact_topk, KNN_EXACT_TOPK_SQL),
}

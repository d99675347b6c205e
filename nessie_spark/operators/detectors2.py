"""Second detector batch: orchestration-shaped operators (SURVEY.md §2.3/§2.7).

Covers: noise injection (P9), DataMap confidence (A7), calibration ECE (O7),
Confident Learning thresholds (A9), stratified CV fold assignment (O1), and
the interval-alignment join (J1) as a mutual-best-overlap matching.

Dawid–Skene label aggregation (A10) lives in detectors3.dawid_skene_labels
(iterative EM over the synthetic 3-voter panel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.functions.core import h64, softmax_arr
from nessie_spark.operators.common import T, h64_sql

_LANGS = ["de", "en", "es", "fr", "zh"]  # sorted label dictionary


def noise_flipped_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flipped_label_noise (/root/reference/nessie/noise.py:27-56): flip each
    label w.p. p=0.05 to one of the other C−1 classes, seeded and
    deterministic per id (offset from the shared h64 — re-execution safe,
    exactly reproducible in the oracle). Output = the noisy copy."""
    docs = T(spark, sf_dir, "documents")
    hsel = h64(F.concat(F.lit("noise-sel|"), F.col("doc_id").cast("string")))
    hoff = h64(F.concat(F.lit("noise-off|"), F.col("doc_id").cast("string")))
    flip = (hsel % 100) < 5
    labels = F.array(*[F.lit(l) for l in _LANGS])
    idx = F.array_position(labels, F.col("lang")) - 1  # 0-based; -1 if absent
    new_idx = (idx + 1 + hoff % (len(_LANGS) - 1)) % len(_LANGS)
    flipped = F.get(labels, new_idx.cast("int"))
    return docs.select(
        "doc_id",
        "lang",
        F.when(flip, flipped).otherwise(F.col("lang")).alias("noisy_lang"),
        flip.alias("was_flipped"),
    ).orderBy("doc_id")


NOISE_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         {h64_sql(x="'noise-sel|' || CAST(doc_id AS VARCHAR)")} % 100 < 5 AS flip,
         {h64_sql(x="'noise-off|' || CAST(doc_id AS VARCHAR)")} % 4 AS off,
         list_position(['de','en','es','fr','zh'], lang) - 1 AS idx
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN flip
            THEN (['de','en','es','fr','zh'])[CAST((idx + 1 + off) % 5 AS INT) + 1]
            ELSE lang END AS noisy_lang,
       flip AS was_flipped
FROM d ORDER BY doc_id
"""


def _epoch_probs(e_col, lo: int):
    return softmax_arr(F.transform(F.slice(e_col, lo, 4), lambda v: v.cast("double")))


def datamap_confidence_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataMapConfidence (/root/reference/nessie/detectors/
    datamap_confidence.py:33-70): mean over 'epochs' of p(label); score =
    1 − confidence. Epochs ≙ three deterministic probability snapshots
    (embedding dim slices 1-4, 5-8, 9-12), the testdata twin of per-epoch
    predict_proba callbacks (datamap_confidence.py:73-88)."""
    emb = T(spark, sf_dir, "embeddings")
    noisy = (F.col("label") % 4).cast("int")
    d = emb.select(
        "vec_id",
        noisy.alias("noisy"),
        *[_epoch_probs(F.col("embedding"), lo).alias(f"p{e}") for e, lo in enumerate((1, 5, 9))],
    )
    conf = (
        F.get("p0", F.col("noisy")) + F.get("p1", F.col("noisy")) + F.get("p2", F.col("noisy"))
    ) / 3.0
    return d.select("vec_id", F.round(1 - conf, 6).alias("score")).orderBy("vec_id")


_SM = (
    "list_transform(list_transform(e{e}, x -> exp(x - list_max(e{e}))), "
    "x -> x / list_sum(list_transform(e{e}, y -> exp(y - list_max(e{e})))))"
)

DATAMAP_SQL = f"""
WITH d AS (
  SELECT vec_id, CAST(label % 4 AS INT) AS noisy,
         list_transform(embedding[1:4],  v -> CAST(v AS DOUBLE)) AS e0,
         list_transform(embedding[5:8],  v -> CAST(v AS DOUBLE)) AS e1,
         list_transform(embedding[9:12], v -> CAST(v AS DOUBLE)) AS e2
  FROM embeddings
), p AS (
  SELECT vec_id, noisy,
         {_SM.format(e=0)} AS p0, {_SM.format(e=1)} AS p1, {_SM.format(e=2)} AS p2
  FROM d
)
SELECT vec_id,
       ROUND(1 - (p0[noisy + 1] + p1[noisy + 1] + p2[noisy + 1]) / 3.0, 6) AS score
FROM p ORDER BY vec_id
"""


def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-calibration-error buckets (/root/reference/nessie/
    calibration.py:87-102 semantics: 10 equal-width max-prob bins, per-bin
    |avg(accuracy) − avg(confidence)|). Output: one row per bin + weight —
    the ECE scalar is Σ w·|acc−conf| over rows."""
    emb = T(spark, sf_dir, "embeddings")
    e4 = F.transform(F.slice("embedding", 1, 4), lambda v: v.cast("double"))
    probs = softmax_arr(e4)
    d = emb.select(
        "vec_id",
        (F.col("label") % 4).cast("int").alias("noisy"),
        probs.alias("p"),
    ).select(
        "vec_id",
        "noisy",
        F.array_max("p").alias("conf"),
        (F.array_position("p", F.array_max("p")) - 1).cast("int").alias("pred"),
    )
    binned = d.withColumn(
        "bin", F.least(F.floor(F.col("conf") * 10), F.lit(9)).cast("int")
    )
    n = binned.count()
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg((F.col("pred") == F.col("noisy")).cast("double")).alias("acc"),
            F.avg("conf").alias("mean_conf"),
        )
        .select(
            "bin",
            "n",
            F.round("acc", 6).alias("acc"),
            F.round("mean_conf", 6).alias("mean_conf"),
            F.round(F.col("n") / F.lit(float(n)), 6).alias("weight"),
        )
        .orderBy("bin")
    )


CALIBRATION_SQL = f"""
WITH d AS (
  SELECT vec_id, CAST(label % 4 AS INT) AS noisy,
         {_SM.format(e=0)} AS p
  FROM (SELECT vec_id, label,
               list_transform(embedding[1:4], v -> CAST(v AS DOUBLE)) AS e0
        FROM embeddings)
), scored AS (
  SELECT vec_id, noisy, list_max(p) AS conf,
         CAST(list_position(p, list_max(p)) - 1 AS INT) AS pred
  FROM d
), binned AS (
  SELECT *, CAST(least(floor(conf * 10), 9) AS INT) AS bin FROM scored
)
SELECT bin, COUNT(*) AS n,
       ROUND(AVG(CASE WHEN pred = noisy THEN 1.0 ELSE 0.0 END), 6) AS acc,
       ROUND(AVG(conf), 6) AS mean_conf,
       ROUND(COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM binned), 6) AS weight
FROM binned GROUP BY bin ORDER BY bin
"""


def confident_learning_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConfidentLearning (/root/reference/nessie/detectors/
    confident_learning.py:22-60, cleanlab semantics): per-class threshold =
    mean self-confidence of instances carrying that class; flag instances
    whose p(own class) falls below their class threshold."""
    emb = T(spark, sf_dir, "embeddings")
    e4 = F.transform(F.slice("embedding", 1, 4), lambda v: v.cast("double"))
    d = emb.select(
        "vec_id",
        (F.col("label") % 4).cast("int").alias("noisy"),
        softmax_arr(e4).alias("p"),
    ).select("vec_id", "noisy", F.get("p", F.col("noisy")).alias("self_conf"))
    thr = d.groupBy("noisy").agg(F.avg("self_conf").alias("threshold"))
    return (
        d.join(F.broadcast(thr), "noisy")
        .select(
            "vec_id",
            "noisy",
            F.round("self_conf", 6).alias("self_conf"),
            F.round("threshold", 6).alias("threshold"),
            (F.col("self_conf") < F.col("threshold")).alias("flag"),
        )
        .orderBy("vec_id")
    )


CONFIDENT_LEARNING_SQL = f"""
WITH d AS (
  SELECT vec_id, CAST(label % 4 AS INT) AS noisy,
         ({_SM.format(e=0)})[CAST(label % 4 AS INT) + 1] AS self_conf
  FROM (SELECT vec_id, label,
               list_transform(embedding[1:4], v -> CAST(v AS DOUBLE)) AS e0
        FROM embeddings)
), thr AS (
  SELECT noisy, AVG(self_conf) AS threshold FROM d GROUP BY noisy
)
SELECT d.vec_id, d.noisy,
       ROUND(d.self_conf, 6) AS self_conf,
       ROUND(t.threshold, 6) AS threshold,
       d.self_conf < t.threshold AS flag
FROM d JOIN thr t ON d.noisy = t.noisy
ORDER BY d.vec_id
"""


def cv_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold assignment (k=5), the CV orchestration core
    (/root/reference/nessie/helper.py:138-256, StratifiedKFold seed 42):
    fold = row_number within label (ordered by the seeded hash) mod k.
    Output: per (label, fold) sizes — the stratification contract the
    reference's shape tests assert (/root/reference/tests/
    test_evaluation.py:13-45)."""
    emb = T(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        h64(F.concat(F.lit("fold|"), F.col("vec_id").cast("string"))), F.asc("vec_id")
    )
    d = emb.select("vec_id", "label").withColumn(
        "fold", ((F.row_number().over(w) - 1) % 5).cast("int")
    )
    return (
        d.groupBy("label", "fold")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("first_vec"))
        .orderBy("label", "fold")
    )


CV_FOLD_SQL = f"""
WITH d AS (
  SELECT vec_id, label,
         CAST((ROW_NUMBER() OVER (PARTITION BY label
              ORDER BY {h64_sql(x="'fold|' || CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) - 1) % 5 AS INT) AS fold
  FROM embeddings
)
SELECT label, fold, COUNT(*) AS n, MIN(vec_id) AS first_vec
FROM d GROUP BY label, fold ORDER BY label, fold
"""


def interval_mutual_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap alignment join (J1 graft: /root/reference/nessie/
    task_support/span_labeling.py:65-114). Two span sets per user — 'click'
    and 'purchase' activity sessions — matched 1:1 by *mutual best overlap*
    (each side's argmax is the other), disjoint pairs dropped: the
    assignment-join semantics re-expressed as a range join + two windows
    (the reference's Hungarian solver reduces to this on non-crossing
    interval sets)."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )

    def sessions(kinds: list[str], tag: str) -> DataFrame:
        e = ev.where(F.col("event_type").isin(kinds))
        w = Window.partitionBy("user_id").orderBy("t")
        s = e.withColumn(
            "is_new", F.when(F.col("t") - F.lag("t").over(w) > 1800, 1).otherwise(0)
        ).withColumn(
            "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        return s.groupBy("user_id", "sid").agg(
            F.min("t").alias(f"{tag}_start"), F.max("t").alias(f"{tag}_end")
        ).withColumnRenamed("sid", f"{tag}_sid")

    a = sessions(["click", "view"], "a")
    b = sessions(["purchase", "signup"], "b")
    pairs = a.join(b, "user_id").where(
        (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end"))
    )
    overlap = F.least("a_end", "b_end") - F.greatest("a_start", "b_start") + 1
    pairs = pairs.withColumn("ov", overlap)
    wa = Window.partitionBy("user_id", "a_sid").orderBy(
        F.desc("ov"), F.asc("b_start"), F.asc("b_sid")
    )
    wb = Window.partitionBy("user_id", "b_sid").orderBy(
        F.desc("ov"), F.asc("a_start"), F.asc("a_sid")
    )
    return (
        pairs.withColumn("ra", F.row_number().over(wa))
        .withColumn("rb", F.row_number().over(wb))
        .where((F.col("ra") == 1) & (F.col("rb") == 1))
        .select("user_id", "a_start", "a_end", "b_start", "b_end", "ov")
        .orderBy("user_id", "a_start", "b_start")
    )


def _hungarian_min(cost) -> list[tuple[int, int]]:
    """O(n³) Hungarian algorithm (potentials formulation — the classical
    Kuhn–Munkres as presented in standard references, e.g. cp-algorithms),
    minimizing total cost of a full assignment of the smaller side.
    scipy.optimize.linear_sum_assignment is not in this container, so the
    solver is implemented directly in numpy/python. Requires n_rows ≤
    n_cols; callers transpose as needed. Returns [(row, col), ...]."""
    import numpy as np

    a = np.asarray(cost, dtype=np.float64)
    n, m = a.shape
    assert n <= m
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)  # p[j] = row matched to column j (1-based; 0 = free)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, m + 1):
                if not used[j]:
                    cur = a[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while True:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
            if j0 == 0:
                break
    return [(p[j] - 1, j - 1) for j in range(1, m + 1) if p[j] != 0]


def interval_optimal_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with the TRUE optimal assignment (/root/reference/nessie/
    task_support/span_labeling.py:65-114: scipy linear_sum_assignment over
    the negated-overlap cost matrix, zero-overlap assignments dropped) —
    exact on crossing interval sets where the mutual-best-overlap join
    (interval_mutual_best_match) is only a heuristic.

    Shape: per-user grouped map (``applyInPandas``) running the O(n³)
    Hungarian solver on that user's A×B overlap matrix — users are the
    natural partition and per-user session counts are small by
    construction (the reference solves per sentence, same contract).
    No SQL oracle (assignment is not SQL-expressible); optimality is
    pytest-verified against permutation brute force (tests/test_hungarian.py)."""
    import numpy as np
    import pandas as pd

    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )

    def sessions(kinds: list[str], side: str) -> DataFrame:
        e = ev.where(F.col("event_type").isin(kinds))
        w = Window.partitionBy("user_id").orderBy("t")
        s = e.withColumn(
            "is_new", F.when(F.col("t") - F.lag("t").over(w) > 1800, 1).otherwise(0)
        ).withColumn(
            "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        return s.groupBy("user_id", "sid").agg(
            F.min("t").alias("start"), F.max("t").alias("end")
        ).select("user_id", F.lit(side).alias("side"), "start", "end")

    both = sessions(["click", "view"], "a").unionByName(
        sessions(["purchase", "signup"], "b")
    )

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        A = pdf[pdf["side"] == "a"].sort_values("start")[["start", "end"]].to_numpy()
        B = pdf[pdf["side"] == "b"].sort_values("start")[["start", "end"]].to_numpy()
        if len(A) == 0 or len(B) == 0:
            return pd.DataFrame(
                columns=["user_id", "a_start", "a_end", "b_start", "b_end", "ov"]
            )
        ov = np.maximum(
            0,
            np.minimum(A[:, None, 1], B[None, :, 1])
            - np.maximum(A[:, None, 0], B[None, :, 0])
            + 1,
        )
        if len(A) <= len(B):
            pairs = _hungarian_min(-ov)
        else:
            pairs = [(i, j) for j, i in _hungarian_min(-ov.T)]
        uid = pdf["user_id"].iloc[0]
        rows = [
            (uid, int(A[i][0]), int(A[i][1]), int(B[j][0]), int(B[j][1]), int(ov[i][j]))
            for i, j in pairs
            if ov[i][j] > 0  # reference drops disjoint assignments
        ]
        return pd.DataFrame(
            rows, columns=["user_id", "a_start", "a_end", "b_start", "b_end", "ov"]
        )

    return (
        both.groupBy("user_id")
        .applyInPandas(
            _solve,
            "user_id long, a_start long, a_end long, b_start long, b_end long, ov long",
        )
        .orderBy("user_id", "a_start", "b_start")
    )


INTERVAL_MATCH_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
),
fa AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM ev WHERE event_type IN ('click','view')
),
sa AS (
  SELECT user_id, sid, MIN(t) AS a_start, MAX(t) AS a_end
  FROM (SELECT user_id, t,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS UNBOUNDED PRECEDING) AS sid FROM fa)
  GROUP BY user_id, sid
),
fb AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM ev WHERE event_type IN ('purchase','signup')
),
sb AS (
  SELECT user_id, sid, MIN(t) AS b_start, MAX(t) AS b_end
  FROM (SELECT user_id, t,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS UNBOUNDED PRECEDING) AS sid FROM fb)
  GROUP BY user_id, sid
),
pairs AS (
  SELECT sa.user_id, sa.sid AS a_sid, sb.sid AS b_sid,
         a_start, a_end, b_start, b_end,
         least(a_end, b_end) - greatest(a_start, b_start) + 1 AS ov
  FROM sa JOIN sb ON sa.user_id = sb.user_id
  WHERE a_start <= b_end AND b_start <= a_end
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id, a_sid
                            ORDER BY ov DESC, b_start ASC, b_sid ASC) AS ra,
         ROW_NUMBER() OVER (PARTITION BY user_id, b_sid
                            ORDER BY ov DESC, a_start ASC, a_sid ASC) AS rb
  FROM pairs
)
SELECT user_id, a_start, a_end, b_start, b_end, ov
FROM ranked WHERE ra = 1 AND rb = 1
ORDER BY user_id, a_start, b_start
"""


def _confident_jstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared confident-joint assignment (cleanlab count_matrix semantics,
    /root/reference/nessie/detectors/confident_learning.py:22-60 →
    cleanlab.filter.find_label_issues): per-class threshold t_j = mean
    self-confidence of examples labeled j; an example joins cell
    (noisy, j*) where j* = argmax_j {p_j : p_j ≥ t_j} (ties → smallest j);
    examples with no class above threshold join no cell (confident NULL).

    Set-based argmax (explode candidates → window top-1): comparisons only,
    so the oracle is exact without float-fold concerns. Output:
    (vec_id, noisy, confident nullable)."""
    emb = T(spark, sf_dir, "embeddings")
    e4 = F.transform(F.slice("embedding", 1, 4), lambda v: v.cast("double"))
    d = emb.select(
        "vec_id",
        (F.col("label") % 4).cast("int").alias("noisy"),
        softmax_arr(e4).alias("p"),
    )
    thr = (
        d.select("noisy", F.get("p", F.col("noisy")).alias("sc"))
        .groupBy("noisy")
        .agg(F.avg("sc").alias("t"))
    )
    tarr = thr.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("noisy", "t"))).alias("ts")
    ).select(F.transform("ts", lambda s: s["t"]).alias("tarr"))
    cand = (
        d.crossJoin(F.broadcast(tarr))
        .select(
            "vec_id", "noisy", "p",
            F.filter(
                F.sequence(F.lit(0), F.lit(3)),
                lambda j: F.get("p", j) >= F.get("tarr", j),
            ).alias("cands"),
        )
        .select("vec_id", "noisy", "p", F.explode_outer("cands").alias("j"))
        .select(
            "vec_id", "noisy", "j",
            F.when(F.col("j").isNotNull(), F.get("p", F.col("j"))).alias("pj"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc_nulls_last("pj"), F.asc_nulls_last("j")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "noisy", F.col("j").cast("int").alias("confident"))
    )


_CONFIDENT_JSTAR_SQL = """
  WITH d AS (
    SELECT vec_id, CAST(label % 4 AS INT) AS noisy, {sm} AS p
    FROM (SELECT vec_id, label,
                 list_transform(embedding[1:4], v -> CAST(v AS DOUBLE)) AS e0
          FROM embeddings)
  ), thr AS (
    SELECT noisy, AVG(p[noisy + 1]) AS t FROM d GROUP BY noisy
  ), tarr AS (
    SELECT list(t ORDER BY noisy) AS tarr FROM thr
  ), cand AS (
    SELECT vec_id, noisy, p,
           [j for j in [0, 1, 2, 3] if p[j + 1] >= tarr[j + 1]] AS cands
    FROM d CROSS JOIN tarr
  ), expl AS (
    SELECT vec_id, noisy, u.j AS j, p[u.j + 1] AS pj
    FROM cand, UNNEST(cands) AS u(j)
    UNION ALL
    SELECT vec_id, noisy, NULL, NULL FROM cand WHERE len(cands) = 0
  ), ranked AS (
    SELECT vec_id, noisy, j, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY pj DESC NULLS LAST, j ASC NULLS LAST) AS rk
    FROM expl
  )
  SELECT vec_id, noisy, CAST(j AS INT) AS confident FROM ranked WHERE rk = 1
"""


def confident_joint_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The confident joint C[noisy][confident] (cleanlab count.py semantics
    via confident_learning.py:22-60): integer counts per cell — the
    distribution-of-label-noise estimate. Cells with no members omitted."""
    j = _confident_jstar(spark, sf_dir)
    return (
        j.where(F.col("confident").isNotNull())
        .groupBy("noisy", "confident")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("noisy", "confident")
    )


CONFIDENT_JOINT_SQL = f"""
WITH jstar AS ({_CONFIDENT_JSTAR_SQL.format(sm=_SM.format(e=0))})
SELECT noisy, confident, COUNT(*) AS cnt
FROM jstar WHERE confident IS NOT NULL
GROUP BY noisy, confident ORDER BY noisy, confident
"""


def confident_learning_prune_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """find_label_issues(filter_by='prune_by_noise_rate') semantics: flag
    the members of off-diagonal confident-joint cells — examples that
    confidently belong to a class other than their given label
    (confident_learning.py:56-58)."""
    j = _confident_jstar(spark, sf_dir)
    return j.select(
        "vec_id",
        "noisy",
        "confident",
        (
            F.col("confident").isNotNull() & (F.col("confident") != F.col("noisy"))
        ).alias("flag"),
    ).orderBy("vec_id")


CONFIDENT_PRUNE_SQL = f"""
WITH jstar AS ({_CONFIDENT_JSTAR_SQL.format(sm=_SM.format(e=0))})
SELECT vec_id, noisy, confident,
       confident IS NOT NULL AND confident != noisy AS flag
FROM jstar ORDER BY vec_id
"""


N_CAL_FOLDS = 5


def _conf_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared input for the calibrator ops: (vec_id, fold, conf, correct).
    conf = max softmax prob of the slice-1:4 voter, fold = vec_id mod 5,
    correct = argmax == noisy label."""
    emb = T(spark, sf_dir, "embeddings")
    e4 = F.transform(F.slice("embedding", 1, 4), lambda v: v.cast("double"))
    probs = softmax_arr(e4)
    return emb.select(
        "vec_id",
        F.pmod("vec_id", F.lit(N_CAL_FOLDS)).cast("int").alias("fold"),
        (F.col("label") % 4).cast("int").alias("noisy"),
        probs.alias("p"),
    ).select(
        "vec_id",
        "fold",
        F.array_max("p").alias("conf"),
        (
            (F.array_position("p", F.array_max("p")) - 1).cast("int")
            == F.col("noisy")
        ).cast("int").alias("correct"),
    )


_CONF_FOLDS_SQL = f"""
  SELECT vec_id,
         CAST(vec_id % {N_CAL_FOLDS} AS INT) AS fold,
         list_max(p) AS conf,
         CAST(CAST(list_position(p, list_max(p)) - 1 AS INT) = noisy AS INT) AS correct
  FROM (SELECT vec_id, CAST(label % 4 AS INT) AS noisy, {_SM.format(e=0)} AS p
        FROM (SELECT vec_id, label,
                     list_transform(embedding[1:4], v -> CAST(v AS DOUBLE)) AS e0
              FROM embeddings))
"""


def calibration_binned_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibrator fit + transform, per CV fold (/root/reference/nessie/
    calibration.py:49-70: the CalibrationCallback fits a netcal calibrator
    on each fold's eval split and transforms that split's probas). Grafted
    calibrator: netcal-style HistogramBinning (10 equal-width bins) — its
    fit is closed-form (per-bin accuracy), so the whole fit+transform is
    exact integer/ratio math with a DuckDB oracle, unlike iterative Platt
    (see calibration_platt_transform for that shape).

    Plan: one groupBy (fold, bin) for the fit (map-side combine; the model
    is 5×10 rows), broadcast join-back to transform — fit tables stay tiny
    no matter the data scale."""
    d = _conf_folds(spark, sf_dir).withColumn(
        "bin", F.least(F.floor(F.col("conf") * 10), F.lit(9)).cast("int")
    )
    fit = d.groupBy("fold", "bin").agg(
        (F.sum("correct").cast("double") / F.count(F.lit(1))).alias("conf_cal")
    )
    return (
        d.join(F.broadcast(fit), ["fold", "bin"])
        .select(
            "vec_id",
            "fold",
            F.round("conf", 6).alias("conf"),
            F.round("conf_cal", 6).alias("conf_cal"),
        )
        .orderBy("vec_id")
    )


CALIBRATION_BINNED_SQL = f"""
WITH d AS (
  SELECT *, CAST(least(floor(conf * 10), 9) AS INT) AS bin
  FROM ({_CONF_FOLDS_SQL})
), fit AS (
  SELECT fold, bin,
         CAST(SUM(correct) AS DOUBLE) / COUNT(*) AS conf_cal
  FROM d GROUP BY fold, bin
)
SELECT d.vec_id, d.fold, ROUND(d.conf, 6) AS conf, ROUND(fit.conf_cal, 6) AS conf_cal
FROM d JOIN fit ON d.fold = fit.fold AND d.bin = fit.bin
ORDER BY d.vec_id
"""


def calibration_platt_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold LOGISTIC calibration fit + transform (/root/reference/
    nessie/calibration.py:49-70 with netcal LogisticCalibration): the
    grouped-map fit-transform shape — ``applyInPandas`` per fold, each task
    fits sigmoid(a·conf + b) ≈ P(correct) by 25 Newton/IRLS steps in numpy
    (deterministic: fixed init a=1, b=0, fixed iteration count, float64)
    and emits the fold's calibrated confidences.

    No SQL oracle (iterative optimization); gated by tests/test_calibration.py:
    ECE(after) < ECE(before) on the fixture + run-to-run determinism."""
    import numpy as np
    import pandas as pd

    d = _conf_folds(spark, sf_dir)

    def _fit_transform(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")  # fixed fold order -> deterministic sums
        x = pdf["conf"].to_numpy(dtype=np.float64)
        y = pdf["correct"].to_numpy(dtype=np.float64)
        a, b = 1.0, 0.0
        for _ in range(25):
            z = a * x + b
            p = 1.0 / (1.0 + np.exp(-z))
            w = np.maximum(p * (1.0 - p), 1e-12)
            g = np.array([((p - y) * x).sum(), (p - y).sum()])
            h00 = (w * x * x).sum()
            h01 = (w * x).sum()
            h11 = w.sum()
            det = h00 * h11 - h01 * h01
            if abs(det) < 1e-12:
                break
            da = (h11 * g[0] - h01 * g[1]) / det
            db = (h00 * g[1] - h01 * g[0]) / det
            a, b = a - da, b - db
        cal = 1.0 / (1.0 + np.exp(-(a * x + b)))
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy(),
                "fold": pdf["fold"].to_numpy(),
                "conf": np.round(x, 6),
                "conf_cal": np.round(cal, 6),
            }
        )

    return (
        d.groupBy("fold")
        .applyInPandas(_fit_transform, "vec_id long, fold int, conf double, conf_cal double")
        .orderBy("vec_id")
    )


QUERIES: dict[str, tuple] = {
    "calibration_binned_transform": (calibration_binned_transform, CALIBRATION_BINNED_SQL),
    "calibration_platt_transform": (calibration_platt_transform, None),  # pytest-gated
    "noise_flipped_labels": (noise_flipped_labels, NOISE_SQL),
    "datamap_confidence_scores": (datamap_confidence_scores, DATAMAP_SQL),
    "calibration_ece": (calibration_ece, CALIBRATION_SQL),
    "confident_learning_flags": (confident_learning_flags, CONFIDENT_LEARNING_SQL),
    "confident_joint_counts": (confident_joint_counts, CONFIDENT_JOINT_SQL),
    "confident_learning_prune_flags": (confident_learning_prune_flags, CONFIDENT_PRUNE_SQL),
    "cv_fold_assignment": (cv_fold_assignment, CV_FOLD_SQL),
    "interval_mutual_best_match": (interval_mutual_best_match, INTERVAL_MATCH_SQL),
    "interval_optimal_match": (interval_optimal_match, None),  # pytest-gated (Hungarian)
}

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


QUERIES: dict[str, tuple] = {
    "noise_flipped_labels": (noise_flipped_labels, NOISE_SQL),
    "datamap_confidence_scores": (datamap_confidence_scores, DATAMAP_SQL),
    "calibration_ece": (calibration_ece, CALIBRATION_SQL),
    "confident_learning_flags": (confident_learning_flags, CONFIDENT_LEARNING_SQL),
    "cv_fold_assignment": (cv_fold_assignment, CV_FOLD_SQL),
    "interval_mutual_best_match": (interval_mutual_best_match, INTERVAL_MATCH_SQL),
}

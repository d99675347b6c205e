"""Detector-quality evaluation — the reference's actual evaluation loop.

The reference ships ``percentage_flagged_score`` as its only metric module
(/root/reference/nessie/metrics.py:4-5), but its paper workflow grades every
detector by ranking instances on the detector score and reporting average
precision and precision-at-k against gold error flags. This module is that
flow, Spark-first: inject seeded label noise (the noise.py twin — gold flag
= "was this label flipped"), score the NOISY labels with a per-surface-form
disagreement detector, rank globally, and report AP / P@k in fixed-point
ppm so the gate compares integers, never float strings.

Scale shapes: the scorer is two broadcast-joined tiny aggregates
(|sources|·|langs| rows); the ranking + prefix sum run through
plans.rank.global_prefix_rank — range-partitioned, per-partition local
windows, offsets folded over one row per partition — so no row of data
ever crosses a single-task window (the AP of 10^9 instances ranks at full
cluster width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nessie_spark.functions.core import h64
from nessie_spark.operators.common import T, h64_sql
from nessie_spark.operators.detectors2 import _LANGS
from nessie_spark.plans.rank import global_prefix_rank

EVAL_KS = (10, 50, 100)


def noisy_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gold, score): gold = the seeded 5% flip flag
    (noise.py:27-56 twin — identical h64 offsets to noise_flipped_labels,
    so the two queries agree row-for-row); score = 1 − p(noisy_lang |
    source), the per-surface-form disagreement scorer
    (baselines.py:49-96 shape) applied to the NOISY labels — exactly the
    inject-then-detect experiment the reference's evaluation grades."""
    docs = T(spark, sf_dir, "documents")
    hsel = h64(F.concat(F.lit("noise-sel|"), F.col("doc_id").cast("string")))
    hoff = h64(F.concat(F.lit("noise-off|"), F.col("doc_id").cast("string")))
    flip = (hsel % 100) < 5
    labels = F.array(*[F.lit(lang) for lang in _LANGS])
    idx = F.array_position(labels, F.col("lang")) - 1
    new_idx = (idx + 1 + hoff % (len(_LANGS) - 1)) % len(_LANGS)
    flipped = F.get(labels, new_idx.cast("int"))
    d = docs.select(
        "doc_id",
        "source",
        F.when(flip, flipped).otherwise(F.col("lang")).alias("noisy_lang"),
        flip.cast("int").alias("gold"),
    )
    grp = d.groupBy("source").agg(F.count(F.lit(1)).alias("t"))
    cnt = d.groupBy("source", "noisy_lang").agg(F.count(F.lit(1)).alias("c"))
    return (
        d.join(F.broadcast(cnt), ["source", "noisy_lang"])
        .join(F.broadcast(grp), "source")
        .select(
            "doc_id",
            "gold",
            F.round(1 - F.col("c") / F.col("t"), 6).alias("score"),
        )
    )


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return global_prefix_rank(
        noisy_scored(spark, sf_dir),
        [F.desc("score"), F.asc("doc_id")],
        "gold",
    )


def detector_eval_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision of the detector ranking vs the gold flip flags:
    AP = (1/P) Σ_{i : gold_i} precision@i, instances ranked (score DESC,
    doc_id ASC). One distributed rank+prefix-sum pass, one aggregate."""
    r = _ranked(spark, sf_dir)
    return r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gold").cast("bigint").alias("n_gold"),
        F.round(
            F.lit(1e6)
            * F.sum(F.when(F.col("gold") == 1, F.col("cum") / F.col("rn")))
            / F.sum("gold")
        )
        .cast("bigint")
        .alias("ap_ppm"),
    )


def detector_eval_p_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision at k ∈ EVAL_KS of the same ranking: hits = gold flags in
    the top k. cum at rank k is an integer-valued running sum → exact."""
    r = _ranked(spark, sf_dir)
    return (
        r.where(F.col("rn").isin(*EVAL_KS))
        .select(
            F.col("rn").alias("k"),
            F.col("cum").cast("bigint").alias("hits"),
            F.round(F.lit(1e6) * F.col("cum") / F.col("rn"))
            .cast("bigint")
            .alias("p_at_k_ppm"),
        )
        .orderBy("k")
    )


_LANG_LIST = "['" + "','".join(_LANGS) + "']"

_SCORED_SQL = f"""
  WITH d AS (
    SELECT doc_id, source, lang,
           {h64_sql(x="'noise-sel|' || CAST(doc_id AS VARCHAR)")} % 100 < 5 AS flip,
           {h64_sql(x="'noise-off|' || CAST(doc_id AS VARCHAR)")} % {len(_LANGS) - 1} AS off,
           list_position({_LANG_LIST}, lang) - 1 AS idx
    FROM documents
  ), nd AS (
    SELECT doc_id, source,
           CASE WHEN flip
                THEN ({_LANG_LIST})[CAST((idx + 1 + off) % {len(_LANGS)} AS INT) + 1]
                ELSE lang END AS noisy_lang,
           CAST(flip AS INT) AS gold
    FROM d
  ), sc AS (
    SELECT doc_id, gold,
           ROUND(1 - COUNT(*) OVER (PARTITION BY source, noisy_lang) * 1.0
                     / COUNT(*) OVER (PARTITION BY source), 6) AS score
    FROM nd
  ), ranked AS (
    SELECT doc_id, gold, score,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn,
           SUM(gold) OVER (ORDER BY score DESC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cum
    FROM sc
  )
"""

DETECTOR_EVAL_AP_SQL = f"""
{_SCORED_SQL}
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(gold) AS BIGINT) AS n_gold,
       CAST(ROUND(1e6 * SUM(CASE WHEN gold = 1 THEN cum * 1.0 / rn END)
                  / SUM(gold)) AS BIGINT) AS ap_ppm
FROM ranked
"""

DETECTOR_EVAL_P_AT_K_SQL = f"""
{_SCORED_SQL}
SELECT rn AS k,
       CAST(cum AS BIGINT) AS hits,
       CAST(ROUND(1e6 * cum / rn) AS BIGINT) AS p_at_k_ppm
FROM ranked
WHERE rn IN ({", ".join(str(k) for k in EVAL_KS)})
ORDER BY k
"""


QUERIES: dict[str, tuple] = {
    "detector_eval_ap": (detector_eval_ap, DETECTOR_EVAL_AP_SQL),
    "detector_eval_p_at_k": (detector_eval_p_at_k, DETECTOR_EVAL_P_AT_K_SQL),
}

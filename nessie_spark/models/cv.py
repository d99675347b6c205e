"""Cross-validation orchestration — CrossValidationHelper graft.

Reference (/root/reference/nessie/helper.py:138-256): stratified k-fold
over (X, y_noisy); per fold fit the model on train, predict/predict_proba
on the held-out split, scatter results back by eval index; detectors then
consume the out-of-fold probabilities.

Engine shape: the fold id is a COLUMN (same seeded-hash stratified rule as
``cv_fold_assignment``, operators/detectors2.py), the fold loop runs on the
driver (k is tiny; each fit/transform inside it is a distributed job), and
the k held-out frames are unioned back — the scatter-by-index becomes a
union of disjoint row sets, so no row ever leaves the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nessie_spark.functions.core import h64
from nessie_spark.models.zoo import SparkModel


def with_folds(df: DataFrame, id_col: str, k: int = 5) -> DataFrame:
    """Stratified fold column (reference helper.py:138-256 /
    StratifiedKFold seed 42 → the engine's seeded-hash rule): fold =
    row_number within label, ordered by h64 of the row id, mod k."""
    w = Window.partitionBy("label").orderBy(
        h64(F.concat(F.lit("fold|"), F.col(id_col).cast("string"))), F.asc(id_col)
    )
    return df.withColumn("fold", ((F.row_number().over(w) - 1) % k).cast("int"))


def cross_val_predict(df: DataFrame, model: SparkModel, id_col: str, k: int = 5) -> DataFrame:
    """Out-of-fold predict_proba for every row (helper.py:208-256 loop).

    Returns the input columns plus fold, probs (array<double>), pred.
    The folded input is cached once: every fit re-reads its k-1/k slice
    and every transform its 1/k slice from the same materialization
    instead of re-scanning the source k times."""
    folded = with_folds(df, id_col, k).cache()
    folded.count()  # materialize before the fold loop
    parts = []
    for f in range(k):
        m = model.fit(folded.where(F.col("fold") != f))
        parts.append(m.predict_proba(folded.where(F.col("fold") == f)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # Materialize the out-of-fold result once, then release the fold cache:
    # .cache() entries live in the CacheManager for the session lifetime
    # (three model-zoo queries back-to-back would each leak a full copy),
    # while localCheckpoint blocks are ContextCleaner-collected once the
    # returned frame becomes unreachable.
    out = out.localCheckpoint(eager=True)
    folded.unpersist()
    return out

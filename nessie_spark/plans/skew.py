"""Explicit skew handling: salted joins and salted two-phase aggregation.

north_rule (BASELINE.json:14): "salted repartitioning for phash hot-key
skew". The synthetic table plants 3 hot phash values over ~5% of rows
(FIXTURES.md §1), which without salting lands 5% of the table in 3 reduce
tasks. AQE skew-join stays enabled as the runtime backstop
(session.py); these helpers are the explicit, plan-level treatment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str | Column, n_salts: int, out: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): derived from xxhash64 of
    the whole row key + a row-unique column when available. Uses xxhash64 of
    monotonically increasing id-free columns to stay re-execution safe."""
    cols = [c for c in df.columns]
    return df.withColumn(out, F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int"))


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact side against a (small-ish) dimension side.

    The skewed side gets a random-but-deterministic salt; the dimension side
    is exploded ×n_salts so every (key, salt) bucket finds its match. The
    shuffle key becomes (key, salt), splitting each hot key across n_salts
    reducers. Output columns = join output minus the salt.
    """
    s = with_salt(skewed, key, n_salts)
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    return s.join(d, on=[key, "_salt"], how=how).drop("_salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase (partial → final) count per key under skew:
    groupBy(key, salt).count → groupBy(key).sum. Map-side combine already
    gives Spark partial aggregation; the explicit salt additionally bounds
    the *reduce-side* row count per task for hot keys, which matters when
    the per-key payload aggregated is wide (e.g. collect_list of file paths
    per hot phash)."""
    s = with_salt(df, key, n_salts)
    partial = s.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))

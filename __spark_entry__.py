"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
training-data-pipeline operators), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB twins for the correctness gate. Engine
maintenance demos (non-SQL-expressible: they create/compact/merge real
tables) have no oracle → rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry() -> dict[str, tuple]:
    from nessie_spark.operators import (
        analytics, dedup, detectors, detectors2, detectors3, events,
        maintenance, modelzoo, probability, similarity, textstats,
    )

    reg: dict[str, tuple] = {}
    for mod in (analytics, detectors, detectors2, detectors3, probability,
                dedup, similarity, textstats, events, maintenance, modelzoo):
        for name, pair in mod.QUERIES.items():
            assert name not in reg, f"duplicate query name {name}"
            reg[name] = pair
    return reg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nessie_spark.operators.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}

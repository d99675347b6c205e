"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# DuckDB twin of nessie_spark.functions.core.h64 (md5-prefix 60-bit hash)
H64_SQL = "(('0x' || substring(md5({x}), 1, 15))::BIGINT)"


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def h64_sql(x: str) -> str:
    return H64_SQL.format(x=x)

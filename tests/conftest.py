"""Shared fixtures: one session-scoped SparkSession + a seeded small table.

Mirrors the reference's fixture discipline (seed 42, smoke scales;
/root/reference/tests/conftest.py:39-42, 149-190).
"""

from __future__ import annotations

import shutil

import pytest

from nessie_spark import synth
from nessie_spark.lakehouse import jobs
from nessie_spark.session import get_spark

SMOKE_N = 256


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, shuffle_partitions=8, app_name="nessie-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def images_small(spark):
    """256-row deterministic images DataFrame (FIXTURES.md §1 smoke scale)."""
    return synth.images_df(spark, SMOKE_N, seed=42)


def make_table(spark, root: str, n: int = SMOKE_N, mean_rows: int = 24):
    """Fresh table at ``root`` with the deliberately-small-file layout."""
    shutil.rmtree(root, ignore_errors=True)
    t = jobs.create_images_table(root)
    df = synth.images_df(spark, n, seed=42)
    bounds = synth.lognormal_file_boundaries(n, seed=42, mean_rows=mean_rows)
    snap = jobs.append(spark, t, df, job_id="ingest", file_boundaries=bounds)
    return t.refresh(), snap


@pytest.fixture(scope="session")
def table_small(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl") / "images")
    return make_table(spark, root)

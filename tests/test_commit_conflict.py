"""Optimistic-commit serialization: two writers holding the same base
version must both land, in order, via the FileExistsError retry loop."""

from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table
from tests.conftest import make_table


def test_stale_writer_retries_and_serializes(spark, tmp_path):
    root = str(tmp_path / "images")
    t, snap0 = make_table(spark, root, n=48, mean_rows=12)
    rows_before = scan(spark, t).count()

    t1 = Table.load(root)
    t2 = Table.load(root)  # same base version as t1 — a stale writer
    s1 = t1.commit("expire", summary={"who": "t1"})
    # t2's first attempt targets the version file t1 just created
    # (O_CREAT|O_EXCL fails) and must refresh + retry, not clobber
    s2 = t2.commit("expire", summary={"who": "t2"})
    assert (s1, s2) == (snap0 + 1, snap0 + 2)

    t = Table.load(root)
    assert t.current_snapshot_id == s2
    whos = [s["summary"].get("who") for s in t.meta["snapshots"]]
    assert whos[-2:] == ["t1", "t2"]
    # carried manifests: the live row set is untouched by either commit
    assert scan(spark, t).count() == rows_before


def test_stale_evolution_commit_serializes(spark, tmp_path):
    from nessie_spark.lakehouse import evolve

    root = str(tmp_path / "images")
    make_table(spark, root, n=48, mean_rows=12)
    t1 = Table.load(root)
    t2 = Table.load(root)
    evolve.add_column(t1, "a_col", "long")
    evolve.add_column(t2, "b_col", "string")  # stale base: retry path
    t = Table.load(root)
    ddl = t.meta["schema"]
    assert "a_col long" in ddl and "b_col string" in ddl
    df = scan(spark, t)
    assert {"a_col", "b_col"} <= set(df.columns)

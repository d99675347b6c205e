"""Write-time sort order (Iceberg write.sort-order): appends land
pre-clustered on the table's space-filling curve, so per-file stats prune
fresh data without waiting for a clustering run."""

from __future__ import annotations

from nessie_spark import synth
from nessie_spark.lakehouse import jobs
from nessie_spark.lakehouse.scan import plan_files, scan

PR = (0, (1 << 61) - 1)  # an eighth of phash space


def _tables(spark, tmp_path, n=512):
    df = synth.images_df(spark, n, seed=11)
    plain = jobs.create_images_table(str(tmp_path / "plain"))
    jobs.append(spark, plain, df, job_id="a")
    sorted_t = jobs.create_images_table(
        str(tmp_path / "sorted"), properties={"write.sort-order": "zorder"}
    )
    jobs.append(spark, sorted_t, df, job_id="a")
    return plain.refresh(), sorted_t.refresh()


def test_sorted_append_prunes_fresh_data(spark, tmp_path):
    plain, sorted_t = _tables(spark, tmp_path)

    p_entries = plain.file_entries().to_pylist()
    s_entries = sorted_t.file_entries().to_pylist()
    assert len(s_entries) > 1  # range partitioning produced several files

    # sorted files carry zorder stats and mostly-disjoint key ranges
    assert all(e["zorder_lo"] is not None for e in s_entries)
    ordered = sorted(s_entries, key=lambda e: e["zorder_lo"])
    assert all(a["zorder_hi"] <= b["zorder_lo"] for a, b in zip(ordered, ordered[1:]))

    p_hit = len(plan_files(plain, phash_range=PR)) / len(p_entries)
    s_hit = len(plan_files(sorted_t, phash_range=PR)) / len(s_entries)
    assert p_hit == 1.0  # random layout: every file spans the range
    assert s_hit < 0.5  # clustered-on-write: most files pruned

    # identical logical content
    ids_p = {r.image_id for r in scan(spark, plain).select("image_id").collect()}
    ids_s = {r.image_id for r in scan(spark, sorted_t).select("image_id").collect()}
    assert ids_p == ids_s and len(ids_p) == 512


def test_sorted_append_drops_zkey_from_data_files(spark, tmp_path):
    import os

    import pyarrow.parquet as pq

    _, sorted_t = _tables(spark, tmp_path, n=128)
    e = sorted_t.file_entries().to_pylist()[0]
    schema = pq.read_schema(os.path.join(sorted_t.root, e["file_path"]))
    assert "zkey" not in schema.names  # staging key never reaches disk


def test_sort_order_param_overrides_property(spark, tmp_path):
    t = jobs.create_images_table(str(tmp_path / "param"))
    jobs.append(
        spark, t, synth.images_df(spark, 128, seed=3), job_id="a", sort_order="zorder"
    )
    t = t.refresh()
    assert all(e["zorder_lo"] is not None for e in t.file_entries().to_pylist())

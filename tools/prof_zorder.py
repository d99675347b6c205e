"""Profile the bench maintenance job phase-by-phase at one parallelism level.

Usage: python tools/prof_zorder.py <cores> [<base_dir>]
Copies (hardlink) the base table, runs compact then zorder with
NESSIE_ZORDER_PROF=1, prints phase timings.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["NESSIE_ZORDER_PROF"] = "1"
os.environ.setdefault("NESSIE_SPARK_DRIVER_MEM", "24g")


def main():
    cores = int(sys.argv[1])
    base = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/nessie_bench/base/images"
    work = f"/dev/shm/nessie_prof/run-{cores}"
    shutil.rmtree(os.path.dirname(work), ignore_errors=True)
    shutil.copytree(os.path.dirname(base), work, copy_function=os.link)
    root = os.path.join(work, "images")

    from nessie_spark.lakehouse import compact, zorder
    from nessie_spark.lakehouse.table import Table
    from nessie_spark.session import get_spark

    spark = get_spark(
        cores=cores,
        shuffle_partitions=max(32, cores * 2),
        app_name=f"prof-{cores}",
        extra_conf={"spark.local.dir": f"/dev/shm/nessie_prof/spark-local-{cores}"},
    )
    import bench

    bench.warm_up(spark)
    t = Table.load(root)
    t0 = time.time()
    r = compact.compact(spark, t, target_bytes=bench.TARGET, job_id="p-compact", reencode=True)
    t1 = time.time()
    print(
        f"[prof] compact={t1 - t0:.2f}s bins={r.bins_executed} in={r.input_files} "
        f"out={r.output_files} rows={r.rows}",
        file=sys.stderr,
    )
    t = t.refresh()
    zr = zorder.cluster(spark, t, target_bytes=bench.TARGET, job_id="p-zorder", reencode=True)
    t2 = time.time()
    print(
        f"[prof] zorder={t2 - t1:.2f}s in={zr.input_files} out={zr.output_files} rows={zr.rows}",
        file=sys.stderr,
    )
    print(f"[prof] cores={cores} total={t2 - t0:.2f}s", file=sys.stderr)
    spark.stop()
    shutil.rmtree(os.path.dirname(work), ignore_errors=True)


if __name__ == "__main__":
    main()

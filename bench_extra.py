"""Round-6 measurement harness (guide §1: measure first; noop-sink §1.4).

NOT the driver bench — ``bench.py`` is frozen for measurement. This file
exists so optimization work can time individual queries, capture
``explain("formatted")`` plans, and run the maintenance job at chosen N
without paying the full interleaved scaling protocol each iteration.

Usage:
  python bench_extra.py queries q1_pricing_summary,bm25_topk [--reps 2]
  python bench_extra.py plans q1_pricing_summary,... --suffix before
  python bench_extra.py maint 16384
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("NESSIE_SPARK_DRIVER_MEM", "24g")


def make_session():
    from nessie_spark.session import get_spark

    return get_spark(
        cores=CPUS,
        shuffle_partitions=max(32, CPUS * 2),
        app_name="bench-extra",
        extra_conf={"spark.local.dir": "/dev/shm/nessie_bx/spark-local"},
    )


def _warm(spark):
    import bench as B

    B.warm_up(spark)
    for t in ("lineitem", "documents", "embeddings", "events"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).collect()


def cmd_queries(names: list[str], reps: int = 1) -> None:
    import __spark_entry__ as E

    qs = E.queries()
    spark = make_session()
    _warm(spark)
    out: dict[str, list[float]] = {}
    for name in names:
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            total = time.time() - t0
            out.setdefault(name, []).append(round(total, 3))
            print(f"[bx] {name}: total={total:.3f}s build={t_build:.3f}s", flush=True)
    print(json.dumps(out))
    spark.stop()


def cmd_plans(names: list[str], suffix: str) -> None:
    import __spark_entry__ as E

    qs = E.queries()
    spark = make_session()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # plan capture must not die on one query
            txt = f"ERROR capturing plan: {e}"
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as fh:
            fh.write(txt)
        print(f"[bx] wrote plans/r06/{name}_{suffix}.txt", flush=True)
    spark.stop()


def cmd_maint(n: int) -> None:
    """Build an N-image table and run the timed compact+zorder job once at
    local[CPUS] (the headline job, minus the scaling protocol)."""
    os.environ["NESSIE_BENCH_N"] = str(n)
    import bench as B

    B.N_IMAGES = n
    work = "/dev/shm/nessie_bx"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "images")
    spark = make_session()
    t0 = time.time()
    B.build_table(spark, root)
    print(f"[bx] build_table({n}) {time.time() - t0:.1f}s", flush=True)
    el, phases = B.run_maintenance(spark, root)
    print(json.dumps({"n": n, "sec": round(el, 3), "phases": phases}))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "queries":
        reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 1
        cmd_queries(sys.argv[2].split(","), reps)
    elif cmd == "plans":
        suf = sys.argv[sys.argv.index("--suffix") + 1] if "--suffix" in sys.argv else "before"
        cmd_plans(sys.argv[2].split(","), suf)
    elif cmd == "maint":
        cmd_maint(int(sys.argv[2]))
    else:
        raise SystemExit(f"unknown command {cmd}")

"""Local emulation of the driver's correctness gate.

Runs each __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) on Spark,
runs the matching oracle_sql() in DuckDB over the same parquet, and compares
row count, column names, and an order-insensitive value hash. Exact float
equality is intentional — the operator suite's float discipline (decimal
sums / round(6)) is designed to be bit-stable across engines.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows: list[dict]) -> str:
    def fmt(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bool):
            return str(bool(v))
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(fmt(x) for x in v) + "]"
        return str(v)

    keys = sorted(rows[0].keys()) if rows else []
    lines = sorted("|".join(fmt(r[k]) for k in keys) for r in rows)
    return hashlib.md5(("\n".join(lines)).encode()).hexdigest()


def main(names: list[str]) -> int:
    import __spark_entry__ as E
    from nessie_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    selected = names or list(qs)
    failures = 0
    for name in selected:
        t0 = time.time()
        sdf = qs[name](spark, SF_DIR)
        srows = [r.asDict(recursive=True) for r in sdf.collect()]
        scols = sorted(sdf.columns)
        el_s = time.time() - t0
        if name not in oracles:
            print(f"  {name:36s} rows={len(srows):6d} (no oracle — rows-only) {el_s:5.1f}s")
            continue
        t0 = time.time()
        # Fetch via pandas, NOT fetchall(): the driver gate converts DuckDB
        # results through pandas, where HUGEINT (e.g. SUM over integers)
        # degrades to float64/object while fetchall() yields exact Python
        # ints. r1 shipped 4 driver hash FAILs that fetchall() masked.
        opdf = con.execute(oracles[name]).df()
        ocols_raw = list(opdf.columns)
        orows = [
            {k: (v.item() if hasattr(v, "item") else v) for k, v in rec.items()}
            for rec in opdf.to_dict("records")
        ]
        el_d = time.time() - t0
        ocols = sorted(ocols_raw)
        ok_rows = len(srows) == len(orows)
        ok_cols = scols == ocols
        ok_hash = ok_rows and ok_cols and canon(srows) == canon(orows)
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{status} {name:36s} rows={len(srows):6d}/{len(orows):6d} "
            f"cols={'=' if ok_cols else scols} hash={'=' if ok_hash else 'DIFF'} "
            f"spark={el_s:4.1f}s duck={el_d:4.1f}s"
        )
        if not (ok_rows and ok_cols and ok_hash):
            failures += 1
            if ok_cols and ok_rows:
                # show first differing canonical lines
                def lines(rows):
                    keys = sorted(rows[0].keys()) if rows else []
                    def fmt(v):
                        return repr(v) if isinstance(v, float) else str(v)
                    return sorted("|".join(fmt(r[k]) for k in keys) for r in rows)
                for a, b in zip(lines(srows), lines(orows)):
                    if a != b:
                        print(f"    spark: {a}\n    duck : {b}")
                        break
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

"""Build nessie_spark.zip for `spark-submit --py-files` (north_rule launch
mode). Pure-stdlib, deterministic member order.

Usage:
    python tools/package.py [out.zip]
    spark-submit --py-files nessie_spark.zip nessie_spark/cli.py --table ... --job ...
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(ROOT, "nessie_spark")
    members = []
    for dirpath, _dirnames, filenames in os.walk(pkg):
        for fn in filenames:
            if fn.endswith(".py"):
                abs_path = os.path.join(dirpath, fn)
                members.append((os.path.relpath(abs_path, ROOT), abs_path))
    members.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, abs_path in members:
            z.write(abs_path, rel)
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "nessie_spark.zip")
    print(build(out))

"""nessie_spark — a PySpark-native analytics + lakehouse-maintenance engine.

Built from scratch with the query/data-processing capabilities of the
reference library (UKPLab/nessie, see SURVEY.md) re-expressed Spark-first,
plus an Iceberg-style table-maintenance engine (compaction, Z-order/Hilbert
clustering, manifest rewrite, snapshot expiry + orphan GC, copy-on-write
MERGE INTO) for image+caption tables per BASELINE.json's north rule.

Layout
------
- ``session``    SparkSession factory (Arrow on, AQE on, tunable parallelism)
- ``functions``  shared column-expression library (hash64, entropy, morton, ...)
- ``operators``  query operators over DataFrames (detectors, dedup, similarity,
                 text stats, TPC-H-ish analytics) — every operator has a DuckDB
                 oracle twin registered for the correctness gate
- ``sources``    loaders (TSV / CoNLL / parquet helpers)
- ``lakehouse``  the table format + maintenance jobs (the engine proper)
- ``plans``      job planners (FFD bin packing, merge planning, expiry BFS)
- ``streaming``  structured-streaming adapters (reference is batch-only)
"""

__version__ = "0.1.0"

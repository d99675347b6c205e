"""Query operators. Every public operator ships as a pair:

- a PySpark implementation ``(spark, sf_dir) -> DataFrame``
- a DuckDB ANSI-SQL oracle string computing the identical result

registered in each module's ``QUERIES`` dict and aggregated by
``/root/repo/__spark_entry__.py`` for the correctness gate.

Float discipline (so value-hashes match the oracle bit-for-bit):
- money aggregates: per-row math in double (IEEE-identical in both
  systems), cast to DECIMAL per row, SUM the decimals (exact, order-free);
- ratios/entropies: round(x, 6) in both systems;
- ranks: always tie-broken by an id column.
"""

"""Core analytics operators over the TPC-H-ish tables.

These prove the engine's scan/filter/aggregate/join/window/sort surface
(the Spark primitives column of SURVEY.md §2) with DuckDB oracles.

Scale notes per query are inline: broadcast hints for dimension joins,
decimal partial aggregation (map-side combine is free), no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.operators.common import T

D202 = "decimal(20,2)"
D204 = "decimal(20,4)"
# Exact-money discipline: the stored doubles are 2-decimal values, so the
# *input* cast to DECIMAL(p,2) is exact (no rounding ties — unlike casting a
# double product, where Spark rounds the binary value and DuckDB the shortest
# repr, diverging on .xxx5 ties). All downstream arithmetic stays in decimal.
D122 = "decimal(12,2)"
D42 = "decimal(4,2)"


def _money(col: str):
    return F.col(col).cast(D122)


def _rate(col: str):
    return F.col(col).cast(D42)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + grouped decimal aggregation.

    Exact decimal math end-to-end (order-independent, hash-identical to the
    oracle). Catalyst gives partial aggregation map-side; the shuffle
    carries 4 groups.
    """
    li = T(spark, sf_dir, "lineitem")
    disc_price = _money("l_extendedprice") * (1 - _rate("l_discount"))
    charge = disc_price * (1 + _rate("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(D202)).alias("sum_qty"),
            F.sum(_money("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sum_qty").cast("double").alias("sum_qty"),
            F.col("sum_base_price").cast("double").alias("sum_base_price"),
            F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
            F.col("sum_charge").cast("double").alias("sum_charge"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (customer broadcast) + top-10.

    customer is the small side → explicit broadcast; orders⋈lineitem is the
    one shuffle. Top-k = orderBy+limit (Spark runs TakeOrdered, no full sort).
    """
    cust = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = _money("l_extendedprice") * (1 - _rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_d"))
        .select(
            "l_orderkey",
            F.col("revenue_d").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, dimensions broadcast."""
    region = T(spark, sf_dir, "region")
    nation = T(spark, sf_dir, "nation")
    cust = T(spark, sf_dir, "customer")
    supp = T(spark, sf_dir, "supplier")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    rev = _money("l_extendedprice") * (1 - _rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(rev.cast(D204)).alias("revenue_d"))
        .select("n_name", F.col("revenue_d").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: top-3 customers per nation by total order value.

    The W1/W3 pattern of the reference (row_number over partitioned
    count-desc windows, /root/reference/nessie/detectors/borda_count.py:31,
    baselines.py:92)."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    nation = T(spark, sf_dir, "nation")
    totals = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(D202)).alias("total_d"))
    )
    j = (
        totals.join(cust, totals.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("total_d"), F.asc("c_custkey"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "n_name",
            "rank",
            "c_custkey",
            "c_name",
            F.col("total_d").cast("double").alias("total_spent"),
        )
        .orderBy("n_name", "rank")
    )


TOP_CUSTOMERS_SQL = """
WITH totals AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS total_d
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT n_name, c_custkey, c_name, total_d,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY total_d DESC, c_custkey ASC) AS rank
  FROM totals
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, rank, c_custkey, c_name, CAST(total_d AS DOUBLE) AS total_spent
FROM ranked WHERE rank <= 3
ORDER BY n_name, rank
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + count by priority."""
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def rollup_pricing_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation via ROLLUP(l_returnflag, l_linestatus) —
    detail rows, per-returnflag subtotals, and the grand total in ONE pass
    (SURVEY §2.3 notes grouping sets are absent in the reference and free
    in Spark; this query evidences them). ``lvl`` is the explicit
    ``grouping(rf)*2 + grouping(ls)`` arithmetic — bit-order-proof across
    engines — and NULL group keys are coalesced to 'ALL' (the raw columns
    are never NULL, so the sentinel is unambiguous).

    Scale: Catalyst's Expand produces the 3 grouping sets map-side, then
    one shuffle carrying |distinct(rf,ls)| × 3 partial rows — grand totals
    at 100 TB cost the same single pass as the detail rows. Money stays
    decimal end-to-end (order-independent, hash-exact)."""
    li = T(spark, sf_dir, "lineitem")
    disc_price = _money("l_extendedprice") * (1 - _rate("l_discount"))
    lvl = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            lvl.alias("lvl"),
            F.sum(F.col("l_quantity").cast(D202)).alias("qty"),
            F.sum(disc_price).alias("rev"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "lvl",
            F.col("qty").cast("double").alias("sum_qty"),
            F.col("rev").cast("double").alias("sum_disc_price"),
            "count_order",
        )
        .orderBy("lvl", "returnflag", "linestatus")
    )


ROLLUP_PRICING_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS lvl,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY lvl, returnflag, linestatus
"""


def cube_year_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(ship_year, l_returnflag): ALL FOUR grouping sets — detail,
    both one-dimension marginals, and the grand total — in one pass
    (rollup_pricing_levels evidences the ROLLUP lattice; this completes
    the grouping-sets family with the full cube). Same bit-order-proof
    ``grouping()`` arithmetic; the int year uses a -1 sentinel, the flag
    'ALL'.

    Scale: one Expand (4 sets) + one shuffle of |distinct(year,flag)| × 4
    partial rows — the two marginal breakdowns cost nothing beyond the
    detail pass. Money stays decimal end-to-end."""
    li = T(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("int")
    )
    disc_price = _money("l_extendedprice") * (1 - _rate("l_discount"))
    lvl = (F.grouping("ship_year") * 2 + F.grouping("l_returnflag")).cast("int")
    return (
        li.cube("ship_year", "l_returnflag")
        .agg(
            lvl.alias("lvl"),
            F.sum(F.col("l_quantity").cast(D202)).alias("qty"),
            F.sum(disc_price).alias("rev"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            F.coalesce("ship_year", F.lit(-1)).alias("ship_year"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            "lvl",
            F.col("qty").cast("double").alias("sum_qty"),
            F.col("rev").cast("double").alias("sum_disc_price"),
            "count_order",
        )
        .orderBy("lvl", "ship_year", "returnflag")
    )


CUBE_YEAR_FLAG_SQL = """
WITH li AS (
  SELECT *, CAST(year(l_shipdate) AS INT) AS ship_year FROM lineitem
)
SELECT COALESCE(ship_year, -1) AS ship_year,
       COALESCE(l_returnflag, 'ALL') AS returnflag,
       CAST(GROUPING(ship_year) * 2 + GROUPING(l_returnflag) AS INT) AS lvl,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM li
GROUP BY CUBE(ship_year, l_returnflag)
ORDER BY lvl, ship_year, returnflag
"""


QUERIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "rollup_pricing_levels": (rollup_pricing_levels, ROLLUP_PRICING_SQL),
    "cube_year_flag": (cube_year_flag, CUBE_YEAR_FLAG_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "top_customers_per_nation": (top_customers_per_nation, TOP_CUSTOMERS_SQL),
    "order_priority_counts": (order_priority_counts, ORDER_PRIORITY_SQL),
}

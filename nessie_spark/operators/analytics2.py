"""Extended TPC-H-shape analytics over the testdata tables.

Widens the scan/filter/join/agg/window/subquery surface beyond
analytics.py's Q1/Q3/Q4/Q5: selective-predicate aggregation (Q6), nation
volume-shipping pairs (Q7), market share (Q8), product profit (Q9),
returned-item ranking (Q10), customer order-count distribution (Q13),
promo share (Q14), top supplier by revenue (Q15), small-quantity revenue
with a correlated per-group threshold (Q17), large-volume customers with
a HAVING semi-join (Q18), OR-of-ANDs predicate revenue (Q19), and a
no-orders anti-join opportunity report (Q22).

Shapes are adapted to the testdata schema: there is no partsupp table and
no comment/shipmode/receiptdate/phone/container columns, so queries that
need them (Q2/Q11/Q12/Q16/Q20/Q21) are re-expressed over the columns that
exist while keeping the join/subquery structure that makes each query a
distinct optimizer exercise.

Exactness discipline (same as analytics.py): money stays DECIMAL through
every sum — the stored doubles are 2-decimal values so the input cast is
exact — and any division happens ONCE at the end in float64 on identical
operands, which is deterministic IEEE arithmetic in both Spark and DuckDB.
Correlated thresholds that would need a rounded division (Q17's
``l_quantity < 0.2*avg(qty)``) are re-expressed as cross-multiplied
integer/decimal comparisons (``5*qty*count < sum_qty``) so the oracle is
exact on ties.

Scale notes inline per query; dimensions are broadcast explicitly, fact
shuffles are on the join keys Catalyst would pick anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.operators.common import T

D202 = "decimal(20,2)"
D204 = "decimal(20,4)"
D122 = "decimal(12,2)"
D42 = "decimal(4,2)"


def _money(col: str):
    return F.col(col).cast(D122)


def _rate(col: str):
    return F.col(col).cast(D42)


def _rev():
    return _money("l_extendedprice") * (1 - _rate("l_discount"))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective scan + ungrouped aggregate — the pushdown probe.

    All three predicates reach the parquet scan (PushedFilters); the
    aggregate is a map-side partial + one-row exchange. The BETWEEN on
    l_discount compares the stored double against exact decimal bounds
    cast back to double (0.05/0.07 are not binary-exact; comparing in
    double on both sides keeps engine agreement)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_money("l_extendedprice") * _rate("l_discount")).alias("rev_d"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(F.col("rev_d").cast("double").alias("revenue"), "n_items")
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: two-role dimension (nation joined twice under an OR of
    ordered pairs) + year bucketing.

    nation is broadcast twice under different aliases; the fact-side
    shuffle is lineitem⋈orders on orderkey, then two broadcast hash joins
    — no shuffle for the nation pair filter."""
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    supp = T(spark, sf_dir, "supplier")
    pair_ok = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev().cast(D204)).alias("rev_d"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.col("rev_d").cast("double").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: market share of one supplier nation inside a region —
    conditional aggregation over a 7-table star, final ratio in float64.

    Both sums stay exact DECIMAL; the single division happens on the
    2-row result."""
    region = T(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n_cust = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_nk"), F.col("n_regionkey").alias("cn_rk")
    )
    n_supp = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nk"), F.col("n_name").alias("supp_nation")
    )
    part = T(spark, sf_dir, "part").where(F.col("p_type").contains("ECO"))
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    supp = T(spark, sf_dir, "supplier")
    nat_rev = F.when(F.col("supp_nation") == "NATION_5", _rev().cast(D204)).otherwise(
        F.lit(0).cast(D204)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_nk"))
        .join(F.broadcast(region), F.col("cn_rk") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(nat_rev).alias("nat_d"),
            F.sum(_rev().cast(D204)).alias("tot_d"),
        )
        .select(
            "o_year",
            (F.col("nat_d").cast("double") / F.col("tot_d").cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       CAST(nat_d AS DOUBLE) / CAST(tot_d AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         SUM(CASE WHEN n2.n_name = 'NATION_5'
                  THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(20,4))
                  ELSE CAST(0 AS DECIMAL(20,4)) END) AS nat_d,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(20,4))) AS tot_d
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type LIKE '%ECO%'
  GROUP BY o_year
)
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so profit = discounted
    revenue rather than revenue − supplycost·qty): LIKE-filtered part
    broadcast into the fact, grouped by supplier nation × order year."""
    part = T(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(_rev().cast(D204)).alias("profit_d"))
        .select(
            "supp_nation", "o_year", F.col("profit_d").cast("double").alias("sum_profit")
        )
        .orderBy("supp_nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS supp_nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(20,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY supp_nation, o_year
ORDER BY supp_nation, o_year DESC
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20.

    The groupBy keys carry the customer attributes (they're functionally
    dependent on c_custkey, grouping on all of them avoids a second
    join-back); top-k is TakeOrdered, not a full sort."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = T(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).alias("rev_d"))
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_d").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution via LEFT OUTER join +
    two-level aggregation (count per customer, then histogram of counts).

    The outer join keeps zero-order customers (c_count = 0) — the row an
    inner join silently drops; priority filter stands in for the comment
    NOT LIKE of the canonical query."""
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    orders = T(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional sum over a broadcast
    part join, one float64 division on the 1-row result."""
    part = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    promo = F.when(
        F.col("p_type").startswith("PROMO"), _rev().cast(D204)
    ).otherwise(F.lit(0).cast(D204))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).alias("promo_d"),
            F.sum(_rev().cast(D204)).alias("tot_d"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("promo_d").cast("double")
                / F.col("tot_d").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT 100.0 * CAST(promo_d AS DOUBLE) / CAST(tot_d AS DOUBLE) AS promo_revenue_pct
FROM (
  SELECT SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(20,4))
                  ELSE CAST(0 AS DECIMAL(20,4)) END) AS promo_d,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(20,4))) AS tot_d
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue "view" per supplier over a quarter, then the
    supplier(s) achieving the global max — the correlated-MAX pattern as a
    broadcast join against a 1-row aggregate (exact DECIMAL equality, no
    float ties)."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = T(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_d")
    )
    mx = revenue.agg(F.max("total_d").alias("max_d"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_d") == F.col("max_d"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_d").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_d
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_d AS DOUBLE) AS total_revenue
FROM revenue
JOIN supplier ON supplier_no = s_suppkey
WHERE total_d = (SELECT MAX(total_d) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — per-part
    correlated threshold ``l_quantity < 0.2 * avg(l_quantity)``.

    The threshold is cross-multiplied to ``5 * qty * n < sum_qty`` so the
    comparison is exact integer/decimal math (a rounded AVG would tie-break
    differently across engines). The per-part aggregate joins back
    broadcast (parts ≪ lineitem); the final /7.0 is one float64 op."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 20)
    )
    li_p = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    stats = li_p.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(D202)).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    # narrow casts keep the product inside decimal(38,_) in BOTH engines
    # (5·qty·n at (2,0)×(10,2)×(10,0) → (24,2); a (20,2)×(20,2) product
    # would overflow Spark's 38-digit cap and silently round)
    small = (
        F.lit(5).cast("decimal(2,0)")
        * F.col("l_quantity").cast("decimal(10,2)")
        * F.col("n").cast("decimal(10,0)")
    ) < F.col("sum_qty")
    return (
        li_p.join(F.broadcast(stats), F.col("l_partkey") == F.col("pk"))
        .where(small)
        .agg(
            F.sum(_money("l_extendedprice")).alias("sum_d"),
            F.count(F.lit(1)).alias("n_small"),
        )
        .select(
            (F.col("sum_d").cast("double") / F.lit(7.0)).alias("avg_yearly"),
            "n_small",
        )
    )


Q17_SQL = """
WITH li_p AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23' AND p_size < 20
), stats AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS DECIMAL(20,2))) AS sum_qty,
         COUNT(*) AS n
  FROM li_p GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM li_p JOIN stats ON l_partkey = pk
WHERE CAST(5 AS DECIMAL(2,0)) * CAST(l_quantity AS DECIMAL(10,2)) * CAST(n AS DECIMAL(10,0)) < sum_qty
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold (HAVING
    over the fact), then joined back to customer/orders — the classic
    "aggregate as a semi-join filter" plan."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(F.col("l_quantity").cast(D202)).alias("sum_qty_d"))
        .where(F.col("sum_qty_d") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("ok"))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            _money("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       CAST(sum_qty_d AS DOUBLE) AS sum_qty
FROM orders
JOIN (
  SELECT l_orderkey AS ok, SUM(CAST(l_quantity AS DECIMAL(20,2))) AS sum_qty_d
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty_d > 150
) ON o_orderkey = ok
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides (brand ×
    size × quantity bands) — the disjunction Catalyst must keep above the
    join while still pushing the common p_partkey equi-key down."""
    part = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = T(spark, sf_dir, "lineitem")
    bands = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(bands)
        .agg(
            F.sum(_rev()).alias("rev_d"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(F.col("rev_d").cast("double").alias("revenue"), "n_items")
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: no phone column, nation stands in for the
    country-code bucket; the synthetic data gives every customer at least
    one lifetime order, so "no orders EVER" is vacuous — the anti-join is
    against recent orders instead): customers with above-average positive
    balance and no order since 1999 — scalar-subquery threshold + LEFT
    ANTI join."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    nation = T(spark, sf_dir, "nation")
    avg_pos = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg((F.sum(_money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("thr"))
    )
    return (
        cust.join(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("thr"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_money("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


Q22_SQL = """
SELECT n_name AS cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cntry
ORDER BY cntry
"""


QUERIES: dict[str, tuple] = {
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q14_promo_effect": (q14_promo_effect, Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "q19_discounted_revenue": (q19_discounted_revenue, Q19_SQL),
    "q22_sales_opportunity": (q22_sales_opportunity, Q22_SQL),
}

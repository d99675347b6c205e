"""The partsupp-family TPC-H shapes (Q2/Q11/Q16/Q20/Q21) over a DERIVED
part-supplier relation.

The testdata has no partsupp table, so both engines construct the same one
from pure integer arithmetic on keys — 4 suppliers per part,
``ps_suppkey = (p_partkey*7 + i*13) % n_supp`` for i ∈ [0,4), with
supply cost and available quantity as key-derived integers (cost in CENTS
so all money stays in BIGINT; doubles appear only in final casts). The
derivation is the same expression tree in Spark and DuckDB, so the oracle
is exact and the *query shapes* — correlated MIN (Q2), HAVING against a
scalar-subquery fraction (Q11), NOT-IN + GROUP BY distinct counts (Q16),
nested IN chains with a correlated half-sum threshold (Q20), and the
double-EXISTS waiting-supplier pattern (Q21, lateness key-derived since
the schema has no receipt/commit dates) — are the real thing.

Scale notes: ps is 4×|part| rows built by exploding a 4-literal array —
never a part×supplier cross join; every dimension join is broadcast; the
one fact shuffle per query is on its natural key. Q21's double EXISTS is
rewritten Spark-side as one per-order aggregation (distinct suppliers /
distinct late suppliers) — the standard decorrelation, one shuffle on
l_orderkey instead of two correlated probes per row; the DuckDB twin keeps
the literal EXISTS/NOT-EXISTS form, so the gate also proves the rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nessie_spark.operators.common import T

PS_SQL = """
ps AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + i.i * 13) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
         (p_partkey * 31 + ((p_partkey * 7 + i.i * 13) % (SELECT COUNT(*) FROM supplier)) * 17) % 90000 + 100 AS ps_cost_cents,
         (p_partkey * 5 + ((p_partkey * 7 + i.i * 13) % (SELECT COUNT(*) FROM supplier)) * 11) % 9999 + 1 AS ps_availqty
  FROM part, (SELECT unnest(range(4)) AS i) i
)
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = T(spark, sf_dir, "supplier")
    ns = supp.agg(F.count(F.lit(1)).alias("n_supp"))
    sk = (F.col("p_partkey") * 7 + F.col("i") * 13) % F.col("n_supp")
    return (
        T(spark, sf_dir, "part")
        .select("p_partkey")
        .join(F.broadcast(ns))
        .select(
            "p_partkey",
            "n_supp",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            sk.cast("long").alias("ps_suppkey"),
            ((F.col("p_partkey") * 31 + sk * 17) % 90000 + 100)
            .cast("long")
            .alias("ps_cost_cents"),
            ((F.col("p_partkey") * 5 + sk * 11) % 9999 + 1)
            .cast("long")
            .alias("ps_availqty"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each size-15 part, the EUROPE supplier(s) charging the
    regional minimum cost — correlated MIN as a broadcast join against the
    per-part regional-min aggregate (exact integer-cents equality)."""
    ps = _ps(spark, sf_dir)
    part = T(spark, sf_dir, "part").where(F.col("p_size") == 15)
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        ps.join(F.broadcast(part.select("p_partkey", "p_type")), ps.ps_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    mn = eu.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_cost_cents").alias("min_cents")
    )
    return (
        eu.join(
            F.broadcast(mn),
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_cost_cents") == F.col("min_cents")),
        )
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("ps_partkey").alias("p_partkey"),
            "p_type",
            "ps_cost_cents",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("nation"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


Q2_SQL = f"""
WITH {PS_SQL.strip()},
eu AS (
  SELECT s_acctbal, s_name, n_name AS nation, ps_partkey, p_type, ps_cost_cents
  FROM ps
  JOIN part     ON ps_partkey = p_partkey
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_size = 15
)
SELECT s_acctbal, s_name, nation, ps_partkey AS p_partkey, p_type, ps_cost_cents
FROM eu e
WHERE ps_cost_cents = (
  SELECT MIN(ps_cost_cents) FROM eu WHERE eu.ps_partkey = e.ps_partkey
)
ORDER BY s_acctbal DESC, nation ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: per-part stock value inside one nation, kept only when it
    exceeds a fraction of the nation's total — HAVING against a scalar
    subquery, all-BIGINT arithmetic (threshold ×200 on both sides)."""
    ps = _ps(spark, sf_dir)
    supp = T(spark, sf_dir, "supplier")
    nation = T(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("ps_partkey", (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v"))
    )
    per_part = nat.groupBy("ps_partkey").agg(F.sum("v").alias("value_cents"))
    total = nat.agg(F.sum("v").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        # 0.005·total compared in exact integers (×200 both sides): the SQL
        # twin's 0.005 literal is DECIMAL in DuckDB but double here, and a
        # value landing exactly on the threshold would diverge at the ulp.
        .where(F.col("value_cents") * 200 > F.col("total_cents"))
        .select(F.col("ps_partkey").alias("p_partkey"), "value_cents")
        .orderBy(F.desc("value_cents"), F.asc("p_partkey"))
    )


Q11_SQL = f"""
WITH {PS_SQL.strip()},
nat AS (
  SELECT ps_partkey, ps_cost_cents * ps_availqty AS v
  FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT ps_partkey AS p_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
FROM nat GROUP BY ps_partkey
HAVING SUM(v) * 200 > (SELECT SUM(v) FROM nat)
ORDER BY value_cents DESC, p_partkey ASC
"""


def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size), with a
    NOT-IN exclusion subquery (negative-balance suppliers stand in for the
    'customer complaints' filter) — anti-join Spark-side, NOT IN in SQL."""
    ps = _ps(spark, sf_dir)
    part = T(spark, sf_dir, "part").where(F.col("p_size").isin(5, 10, 15, 20))
    bad = T(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_sk")
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == F.col("bad_sk"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


Q16_SQL = f"""
WITH {PS_SQL.strip()}
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part ON ps_partkey = p_partkey
WHERE p_size IN (5, 10, 15, 20)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock of 'red' parts — nested IN
    chains with a correlated half-of-1997-sales threshold. Spark decorrelates
    as joins; the SQL twin keeps the canonical nested INs."""
    ps = _ps(spark, sf_dir)
    red = T(spark, sf_dir, "part").where(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sold = li.groupBy(
        F.col("l_partkey").alias("sk_part"), F.col("l_suppkey").alias("sk_supp")
    ).agg(F.sum("l_quantity").alias("qty"))
    qualifying = (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey, "left_semi")
        .join(
            sold,
            (F.col("ps_partkey") == F.col("sk_part"))
            & (F.col("ps_suppkey") == F.col("sk_supp")),
        )
        .where(F.col("ps_availqty") > F.lit(0.5) * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = T(spark, sf_dir, "supplier")
    return (
        supp.join(qualifying, supp.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH {PS_SQL.strip()}
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT ps_suppkey FROM ps
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND ps_availqty > 0.5 * (
      SELECT SUM(l_quantity) FROM lineitem
      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
)
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    finished multi-supplier order. The schema has no receipt/commit dates,
    so lateness is key-derived — ``(l_orderkey*3 + l_suppkey) % 4 == 0`` —
    identically in both engines; the join/EXISTS structure is the point.

    Spark decorrelates the double EXISTS into one per-order aggregation
    (distinct suppliers, distinct LATE suppliers) joined back to the late
    lines; the oracle keeps literal EXISTS / NOT EXISTS, so the gate also
    certifies the rewrite."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    late = (F.col("l_orderkey") * 3 + F.col("l_suppkey")) % 4 == 0
    lf = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi").select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    per_order = lf.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    l1 = lf.where(F.col("late"))
    supp = T(spark, sf_dir, "supplier")
    return (
        l1.join(F.broadcast(per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))), "l_orderkey")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


Q21_SQL = """
WITH lf AS (
  SELECT l_orderkey, l_suppkey,
         ((l_orderkey * 3 + l_suppkey) % 4 = 0) AS late
  FROM lineitem
  WHERE EXISTS (SELECT 1 FROM orders
                WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
)
SELECT s_name, COUNT(*) AS numwait
FROM lf l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lf l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lf l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — count orders in a quarter
    that had at least one LATE line item, per priority. The schema has no
    commit/receipt dates, so lateness is the same key-derived predicate as
    Q21 (``(l_orderkey*3 + l_suppkey) % 4 == 0``) in both engines; the
    EXISTS → LEFT SEMI join + priority rollup is the real Q4 structure.

    Scale shape: the semi join deduplicates lineitem probes (no fanout on
    multi-line orders) and the priority groupBy is a 5-row aggregate —
    map-side partial all the way."""
    orders = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    late_lines = T(spark, sf_dir, "lineitem").where(
        (F.col("l_orderkey") * 3 + F.col("l_suppkey")) % 4 == 0
    ).select("l_orderkey")
    return (
        orders.join(
            late_lines, orders.o_orderkey == late_lines.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND (l.l_orderkey * 3 + l.l_suppkey) % 4 = 0)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipping-mode vs order-priority cross-tab — per
    (derived) ship mode, how many LATE-shipped lines belong to
    high-priority (1-URGENT/2-HIGH) vs lower-priority orders in one ship
    year. The schema has no l_shipmode, so mode is key-derived
    (``MAIL/SHIP/TRUCK`` by ``l_partkey % 3``) identically in both
    engines; the fact⋈orders join + CASE-sum rollup is the real Q12.

    Scale shape: one shuffle (lineitem⋈orders on orderkey); the two
    CASE-sums partially aggregate map-side into a 3-row result."""
    modes = F.array(F.lit("MAIL"), F.lit("SHIP"), F.lit("TRUCK"))
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & ((F.col("l_orderkey") * 3 + F.col("l_suppkey")) % 4 == 0)
    ).select(
        "l_orderkey",
        F.element_at(modes, (F.col("l_partkey") % 3 + 1).cast("int")).alias(
            "ship_mode"
        ),
    )
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


Q12_SQL = """
SELECT ship_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT l_orderkey,
         (['MAIL', 'SHIP', 'TRUCK'])[CAST(l_partkey % 3 AS INT) + 1] AS ship_mode
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND (l_orderkey * 3 + l_suppkey) % 4 = 0
) l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY ship_mode
ORDER BY ship_mode
"""


QUERIES: dict[str, tuple] = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q12_shipmode_priority": (q12_shipmode_priority, Q12_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q16_parts_supplier_counts": (q16_parts_supplier_counts, Q16_SQL),
    "q20_potential_promotion": (q20_potential_promotion, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
}

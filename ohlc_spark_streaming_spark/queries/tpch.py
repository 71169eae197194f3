"""TPC-H-shaped relational battery (adapted to the slim testdata schema).

The reference's own query surface is a single streaming aggregation
(`/root/reference/main.py:119-188`); this module proves the engine's
relational breadth on the classic decision-support shapes — EXISTS /
NOT-EXISTS decorrelation, conditional aggregation, disjunctive join
predicates, HAVING subqueries, scalar-subquery comparisons — each with a
DuckDB oracle. Predicates are adapted where the slim schema lacks a TPC-H
column (no commitdate/receiptdate/shipmode/partsupp); the SHAPE (and
therefore the plan class Catalyst must produce) is preserved.

Scale notes (100 TB discipline):
* Bounded dimension sides (nation, region, 1-row scalar aggregates) carry
  hard broadcast hints; SF-proportional dimensions (part, supplier,
  customer — filtered or not) carry NO hint, so AQE broadcasts them at
  small scale by measured size but falls back to a shuffled join at
  100 TB instead of OOMing an executor (VERDICT r5 item 3). The only
  unavoidable shuffles are on lineitem/orders group keys.
* EXISTS/NOT EXISTS are expressed as semi/anti joins — Spark decorrelates
  to the same; no per-row subquery execution anywhere.
* Scalar subqueries (avg/max thresholds) evaluate to one row and feed a
  broadcast nested-loop with a single comparison — constant cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import anti_join, semi_join
from ..registry import dec_sum, register
from ..sources.batch import load_table

_TS = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731


@register(
    "q6_forecast_revenue",
    """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate, no joins.

    The whole WHERE clause must reach the parquet scan as pushed filters;
    the aggregate is a two-phase (partial → single final) hash agg with a
    1-row output — the cheapest possible plan class."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-decorrelated semi join + grouped count.

    (Adapted: the slim lineitem has no commit/receipt dates, so the EXISTS
    predicate is l_returnflag = 'R'.) The semi join shuffles on orderkey
    and never materializes lineitem payload columns."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1996-04-01 00:00:00"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        semi_join(o, l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_REV = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)"


@register(
    "q10_returned_items",
    f"""
SELECT c_custkey, c_name, {_REV} AS revenue, c_acctbal, n_name, c_mktsegment
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer, top 20.

    nation broadcasts (bounded); customer and lineitem⋈orders are left
    to AQE — at small scale it re-plans to a runtime broadcast, at
    100 TB they stay shuffled joins (customer is SF-proportional and
    orders fact-sized; a compile-time broadcast hint would OOM there).
    The ORDER BY carries c_custkey so LIMIT 20 is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1996-07-01 00:00:00"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dec_sum(revenue, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
    )


@register(
    "q12_priority_by_status",
    """
SELECT
  l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation.

    (Adapted: no l_shipmode column — grouped by l_linestatus instead.)
    Integer CASE sums are exact, so no decimal discipline is needed."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_effect",
    """
SELECT
  100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
            THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
    AS promo_revenue_pct,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
)
def q_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share — part join (AQE-sized:
    broadcast at small SF, shuffled at 100 TB) + ratio of conditional
    sums. Both sums stay decimal until the final division, so
    the single output row is bit-stable under any partitioning."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _TS("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1996-10-01 00:00:00"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    # Both sums are exact decimals; the DIVISION happens in doubles (left-
    # to-right, same association as the oracle) — decimal division rounds
    # under engine-specific precision rules and drifts by one ulp.
    dec = lambda c: F.sum(c.cast("decimal(30,6)")).cast("double")  # noqa: E731
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * dec(promo) / dec(rev)).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q16_supplier_part_counts",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN anti join + COUNT(DISTINCT) rollup.

    (Adapted: no partsupp table — lineitem stands in as the part↔supplier
    relation, and the NOT-IN excludes negative-balance suppliers.) The
    anti join's exclusion list is AQE-sized (supplier-proportional —
    no hard hint); count-distinct expands
    to a two-level aggregate (distinct-ize, then count) on one shuffle."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    s_bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    l = load_table(spark, sf_dir, "lineitem")
    return (
        anti_join(l, s_bad, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_customers",
    """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def q_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders — IN over a HAVING aggregate.

    The HAVING subquery aggregates lineitem once, keeps only qualifying
    orderkeys (a tiny set), and semi-joins back — so the expensive table
    is scanned twice but shuffled on the same key both times, and the
    second pass is pre-filtered by the semi join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("_q"))
        .where(F.col("_q") > 150)
        .select(F.col("l_orderkey").alias("_big_orderkey"))
    )
    return (
        l.join(big, F.col("l_orderkey") == F.col("_big_orderkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@register(
    "q19_disjunctive_revenue",
    """
SELECT
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive (OR-of-ANDs) join predicate.

    The join key stays a pure equi key (partkey) so a hash join
    survives (AQE-sized — part is SF-proportional, so no hard broadcast
    hint); the OR block is a post-join filter. Catalyst also
    derives the implied disjunction of per-side predicates for pushdown."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(p, F.col("p_partkey") == F.col("l_partkey"))
    band = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.where(band("Brand#12", 15, 1, 21) | band("Brand#23", 25, 10, 30) | band("Brand#34", 35, 20, 40))
        .agg(dec_sum(rev, 6).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue.

    The revenue CTE is computed once and reused for both the max scalar
    and the equality filter (same DataFrame object → Spark reuses the
    exchange); the max arrives via a broadcast 1-row cross join, not a
    driver collect."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1996-04-01 00:00:00"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dec_sum(rev, 6).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("_max_rev"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q22_dormant_customers",
    """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY c_mktsegment
""",
)
def q_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join.

    (Adapted: every synthetic customer has orders, so 'no account at all'
    becomes 'no orders since 2000-06-01'; c_mktsegment stands in for the
    phone-prefix country code.) The AVG scalar is exact by symmetry of the
    single-row aggregate; the anti join shuffles only custkeys."""
    c = load_table(spark, sf_dir, "customer")
    o_recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _TS("2000-06-01 00:00:00")
    )
    avg_pos = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    rich = c.join(F.broadcast(avg_pos), F.col("c_acctbal") > F.col("_avg_bal"))
    return (
        anti_join(rich, o_recent, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "q7_nation_trade",
    f"""
SELECT
  n1.n_name AS cust_nation,
  n2.n_name AS supp_nation,
  year(l_shipdate) AS l_year,
  {_REV} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
""",
)
def q_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year — the same dimension table joined twice under different roles.
    Both nation sides broadcast (bounded); customer/supplier/orders are
    left to AQE (SF- and fact-proportional at 100 TB — no compile-time
    broadcast hint); the cross-nation asymmetry filter runs post-join on
    the nation columns."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dec_sum(rev, 6).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q13_order_count_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts — LEFT OUTER join
    (customers with no orders count as 0) followed by a second aggregation
    over the first's results. Two shuffles, the second over a tiny domain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    """
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS total_price
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into one aggregate of lineitem joined back by partkey.
    Quantities are integral doubles, so avg = exact-sum / count is
    bit-stable under any partitioning and the 0.2× threshold compares
    identically on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    per_part = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        # per_part spans ALL parts (not brand-pruned) — fact-adjacent
        # cardinality at extreme scale, so AQE decides, not a hint.
        .join(per_part, F.col("t_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum("l_extendedprice").alias("total_price"),
        )
    )


@register(
    "q21_waiting_suppliers",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
)
def q_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS over the same
    table, decorrelated into ONE per-order aggregate — the blamed supplier
    is the sole 'R' supplier in a multi-supplier finalized order, i.e.
    n_suppliers ≥ 2 AND n_r_suppliers = 1. One lineitem aggregation
    replaces two correlated subscans; the per-order stats join is
    AQE-sized (order-proportional — no hard broadcast hint)."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    ord_stats = l.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_rsupp"),
    )
    return (
        l.where(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            ord_stats.where((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1)),
            F.col("g_orderkey") == F.col("l_orderkey"),
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q8_market_share",
    """
SELECT year(o_orderdate) AS l_year,
  100.0 * CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
            THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
    AS mkt_share_pct,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
GROUP BY 1
""",
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of a region's PROMO revenue
    by year — a 7-table star join (nation twice) feeding a ratio of
    conditional decimal sums; division in doubles (q14 discipline)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    dec = lambda col: F.sum(col.cast("decimal(30,6)")).cast("double")  # noqa: E731
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("l_year"))
        .agg(
            (F.lit(100.0) * dec(target) / dec(rev)).alias("mkt_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q9_product_type_profit",
    """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
    AS profit,
  COUNT(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def q_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation-year for parts matching
    a LIKE pattern. (Adapted: no partsupp — supply cost proxied as 10% of
    p_retailprice.) The LIKE filter prunes part FIRST, then everything
    but lineitem joins AQE-sized (part/supplier are SF-proportional —
    no hard hints; nation keeps one)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            dec_sum(profit, 6).alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- synthetic partsupp (closes the q2/q11/q20 gap) -------------------------

_PARTSUPP_SQL = """
partsupp AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         ((l_partkey * 31 + l_suppkey * 7) % 10000) / 100.0 AS ps_supplycost,
         (l_partkey * 7 + l_suppkey * 13) % 1000           AS ps_availqty
  FROM lineitem
)"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The slim schema has no partsupp; derive a DETERMINISTIC stand-in
    from the observed (part, supplier) pairs with closed-form cost/stock
    (pure integer arithmetic ÷ 100.0 — the identical IEEE op on both
    engines, so every derived aggregate stays oracle-exact)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7) % 10000)
                / 100.0
            ).alias("ps_supplycost"),
            ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 1000).alias(
                "ps_availqty"
            ),
        )
    )


@register(
    "q2_min_cost_supplier",
    f"""
WITH {_PARTSUPP_SQL.lstrip()},
regional AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, s_acctbal
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
best AS (
  SELECT ps_partkey, MIN(ps_supplycost) AS min_cost FROM regional GROUP BY 1
)
SELECT p_partkey, p_name, s_name, s_acctbal, ps_supplycost
FROM part
JOIN regional ON p_partkey = ps_partkey
JOIN best ON best.ps_partkey = regional.ps_partkey
         AND ps_supplycost = best.min_cost
WHERE p_size = 14
""",
)
def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the minimum-cost regional supplier per part — a
    correlated MIN subquery decorrelated into one per-part aggregate
    joined back on cost equality. The regional partsupp is computed once
    and reused for both the min and the equality probe."""
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") == 14)
    regional = (
        ps.join(s, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "s_acctbal")
    )
    best = regional.groupBy(F.col("ps_partkey").alias("b_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        regional.join(
            best,
            (F.col("ps_partkey") == F.col("b_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "ps_supplycost")
    )


@register(
    "q11_important_stock",
    f"""
WITH {_PARTSUPP_SQL.lstrip()},
vals AS (
  SELECT ps_partkey,
         CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(30,6))) AS DOUBLE)
           AS value
  FROM partsupp GROUP BY 1
)
SELECT ps_partkey, value
FROM vals
WHERE value > (SELECT 2.0 * (CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                             / COUNT(*))
               FROM vals)
""",
)
def q_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value exceeds a threshold
    derived from a scalar aggregate over the SAME grouped result —
    HAVING-vs-global shape with the per-part table computed once and
    reused. (The classic fixed-fraction-of-total threshold degenerates as
    data grows — TPC-H itself divides it by SF — so the threshold here is
    2× the average per-part value, which is scale-free. avg = exact-
    decimal-sum / count, bit-stable on both engines.)"""
    ps = _partsupp(spark, sf_dir)
    val = (F.col("ps_supplycost") * F.col("ps_availqty")).cast("decimal(30,6)")
    vals = ps.groupBy("ps_partkey").agg(
        F.sum(val).cast("double").alias("value")
    )
    total = vals.agg(
        (F.lit(2.0) * (F.sum(F.col("value").cast("decimal(30,6)")).cast("double") / F.count(F.lit(1)))).alias("_threshold")
    )
    return (
        vals.join(F.broadcast(total), F.col("value") > F.col("_threshold"))
        .select("ps_partkey", "value")
    )


@register(
    "q20_overstocked_suppliers",
    f"""
WITH {_PARTSUPP_SQL.lstrip()},
red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
sold AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS qty_sold
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s_name, COUNT(DISTINCT ps_partkey) AS n_overstocked_parts
FROM partsupp
JOIN red_parts ON ps_partkey = p_partkey
JOIN sold ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON s_suppkey = ps_suppkey
WHERE ps_availqty > 20 * qty_sold
GROUP BY s_name
""",
)
def q_q20_overstocked_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding > 20× a year's sales of 'red'
    parts — the nested IN/EXISTS chain decorrelated into one per-(part,
    supplier) sales aggregate joined to the synthetic partsupp."""
    ps = _partsupp(spark, sf_dir)
    red = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
    )
    sold = l.groupBy("l_partkey", "l_suppkey").agg(
        dec_sum("l_quantity").alias("qty_sold")
    )
    return (
        ps.join(red, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            sold,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(F.col("ps_availqty") > 20 * F.col("qty_sold"))
        .join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct("ps_partkey").alias("n_overstocked_parts"))
    )

"""Relational breadth: aggregations, joins, analytic windows, sorts/top-k,
set operations (SURVEY.md §2.3-§2.8) over the TPC-H-ish tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import dec_sum, register
from ..sources.batch import load_table


@register(
    "q1_pricing_summary",
    """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)       AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)  AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
                                                               AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE)
                                                               AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*)      AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation with exact-decimal sums (TPC-H Q1 shape).

    Plan: scan → partial hash-agg → shuffle on (returnflag, linestatus) →
    final hash-agg; the decimal cast keeps sums bit-identical under any
    partitioning."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        l.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price, 6).alias("sum_disc_price"),
            dec_sum(charge, 6).alias("sum_charge"),
            (dec_sum("l_quantity") / n).alias("avg_qty"),
            (dec_sum("l_extendedprice") / n).alias("avg_price"),
            n.alias("count_order"),
        )
    )

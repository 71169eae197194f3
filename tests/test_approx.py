"""Approximate aggregates: sketch accuracy bounds vs exact answers (no
cross-engine oracle possible — HLL implementations differ by engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_CORRECTNESS


def test_approx_count_distinct_error_bound(spark):
    l = load_table(spark, SF_CORRECTNESS, "lineitem")
    joined = (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert joined
    for r in joined:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r


def test_approx_percentile_brackets_exact(spark):
    l = load_table(spark, SF_CORRECTNESS, "lineitem")
    row = l.agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("ap"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("ex"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).collect()[0]
    assert row.lo <= row.ap <= row.hi
    assert abs(row.ap - row.ex) / (row.hi - row.lo) < 0.02

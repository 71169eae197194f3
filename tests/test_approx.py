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


def test_hll_sketch_merge_equals_direct(spark):
    """Sketch mergeability (the 100 TB cardinality pattern): per-day HLL
    sketches unioned with hll_union_agg must estimate EXACTLY what one
    direct sketch over all rows estimates — merge(sketch(a), sketch(b)) is
    sketch(a ∪ b) by construction, so the rollup layer loses nothing."""
    from pyspark.sql import functions as F

    from ohlc_spark_streaming_spark.sources.batch import load_table

    from .conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    daily = e.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    merged = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("n")
    ).collect()[0].n
    direct = e.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("n")
    ).collect()[0].n
    assert merged == direct
    exact = e.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05

"""Scale-discipline checks: bucketed co-located joins, RocksDB state
store, and the reference's multi-query concurrency pattern (SURVEY §2.9
ST5, §4.2). These verify the mechanisms a 100 TB deployment leans on,
exercised at smoke scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.operators.ohlc import ohlc_candles
from ohlc_spark_streaming_spark.sources.batch import load_table
from ohlc_spark_streaming_spark.sources.stream import events_stream
from ohlc_spark_streaming_spark.streaming.candles import (
    run_to_memory,
    streaming_ohlc_candles,
)

from .conftest import SF_SMOKE

KW = dict(ts_col="ts", symbol_col="event_type", price_col="value", qty_col=None,
          window_duration="1 hour")


def test_bucketed_join_avoids_shuffle(spark):
    """Tables bucketed on the join key co-locate: the sort-merge join plan
    contains NO shuffle exchange — at 100 TB this removes the dominant
    cost of a big-big join. (Bucket co-location is the persisted-table twin
    of repartition-before-join. Managed tables land in the session's
    default warehouse dir and are dropped on exit.)"""
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    for name, df, key in (
        ("b_orders", orders, "o_custkey"),
        ("b_customer", customer, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(4, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    # Disable auto-broadcast so the join would otherwise shuffle both sides.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            spark.table("b_orders").o_custkey
            == spark.table("b_customer").c_custkey,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # And it still computes the right thing.
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_rocksdb_state_store_parity(spark):
    """The RocksDB state store (the 100 TB keyspace choice, SURVEY §4.2)
    produces the same streaming answer as the default HDFS-backed store."""
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = run_to_memory(
            streaming_ohlc_candles(
                events_stream(spark, SF_SMOKE), watermark_delay="2 minutes", **KW
            ),
            "rocksdb_parity",
            output_mode="complete",
        )
        batch = ohlc_candles(load_table(spark, SF_SMOKE, "events"), **KW)
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, batch.collect())
        )
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_concurrent_streaming_queries(spark):
    """The reference runs 5 concurrent queries over one source
    (/root/reference/main.py:98-216); verify independent concurrent
    incremental plans + awaitAnyTermination semantics."""
    stream = events_stream(spark, SF_SMOKE)
    candles = streaming_ohlc_candles(stream, watermark_delay="2 minutes", **KW)
    raw_tap = stream.select("event_id", "ts", "event_type")

    q1 = (
        candles.writeStream.format("memory")
        .queryName("concurrent_candles")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        raw_tap.writeStream.format("memory")
        .queryName("concurrent_tap")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    spark.streams.awaitAnyTermination()
    q1.awaitTermination()
    q2.awaitTermination()
    spark.streams.resetTerminated()
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert spark.table("concurrent_tap").count() == n_events
    assert spark.table("concurrent_candles").count() > 0


def test_salted_aggregation_exactness(spark):
    """Two-phase salted aggregation must be bit-identical to the direct
    aggregation (decimal partials are associative), on a skewed input
    where one key holds ~40% of rows."""
    from pyspark.sql import functions as F
    from ohlc_spark_streaming_spark.operators.skew import salted_sum_count

    e = load_table(spark, SF_SMOKE, "events")
    skewed = e.withColumn(
        "k", F.when(F.col("event_id") % 5 < 2, "HOT").otherwise(F.col("event_type"))
    )
    direct = {
        (r.k, r.sum_value, r.n_rows)
        for r in skewed.groupBy("k")
        .agg(
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in salted_sum_count(
            skewed, ["k"], "value", salt_source="event_id", n_salts=8
        ).collect()
    }
    assert salted == direct
    # The phase-1 plan really shards: distinct (k, salt) > distinct k.
    n_shards = (
        skewed.withColumn("_salt", F.pmod(F.hash(F.col("event_id")), F.lit(8)))
        .select("k", "_salt")
        .distinct()
        .count()
    )
    assert n_shards > skewed.select("k").distinct().count()


def test_salted_join_is_exact_and_shuffles_on_salted_key(spark):
    """salted_join must return exactly the plain join's rows while its
    exchange carries the salt (hot keys spread over n_salts reducers)."""
    from ohlc_spark_streaming_spark.operators.joins import salted_join

    l = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = l.join(o, "l_orderkey")
    salted = salted_join(
        l, o, on="l_orderkey", salt_source="l_partkey", n_salts=8
    )
    cols = sorted(plain.columns)
    a = sorted(map(tuple, plain.select(*cols).collect()))
    b = sorted(map(tuple, salted.select(*cols).collect()))
    assert a == b

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan

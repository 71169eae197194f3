"""Join operator semantics, especially the as-of join's edge cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from ohlc_spark_streaming_spark.operators.joins import asof_join

TS = lambda s: dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("lv", T.DoubleType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("rv", T.DoubleType()),
    ]
)


def _run(spark, left_rows, right_rows, how="left"):
    left = spark.createDataFrame(left_rows, LEFT_SCHEMA)
    right = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_payload=["rv"], how=how,
    )
    return {(r["k"], r["ts"]): (r["asof_ts"], r["asof_rv"]) for r in out.collect()}


def test_asof_backward_picks_latest_at_or_before(spark):
    res = _run(
        spark,
        [("a", TS(10), 1.0), ("a", TS(20), 2.0)],
        [("a", TS(5), 100.0), ("a", TS(15), 200.0), ("a", TS(25), 300.0)],
    )
    assert res[("a", TS(10))] == (TS(5), 100.0)
    assert res[("a", TS(20))] == (TS(15), 200.0)


def test_asof_inclusive_at_equal_ts(spark):
    res = _run(spark, [("a", TS(10), 1.0)], [("a", TS(10), 42.0)])
    assert res[("a", TS(10))] == (TS(10), 42.0)


def test_asof_no_match_left_null_inner_drops(spark):
    left = [("a", TS(1), 1.0)]
    right = [("a", TS(5), 9.0)]  # only AFTER left ts
    assert _run(spark, left, right, how="left") == {("a", TS(1)): (None, None)}
    assert _run(spark, left, right, how="inner") == {}


def test_asof_keys_do_not_leak(spark):
    res = _run(
        spark,
        [("a", TS(10), 1.0), ("b", TS(10), 2.0)],
        [("a", TS(5), 7.0)],  # nothing for key b
    )
    assert res[("a", TS(10))] == (TS(5), 7.0)
    assert res[("b", TS(10))] == (None, None)

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


def _run_fwd(spark, left_rows, right_rows, how="left", tolerance=None):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(left_rows, LEFT_SCHEMA)
    right = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
    tol = F.expr(f"INTERVAL {tolerance} SECONDS") if tolerance is not None else None
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_payload=["rv"], how=how, direction="forward", tolerance=tol,
    )
    return {(r["k"], r["ts"]): (r["asof_ts"], r["asof_rv"]) for r in out.collect()}


def test_asof_forward_picks_earliest_at_or_after(spark):
    res = _run_fwd(
        spark,
        [("a", TS(10), 1.0), ("a", TS(20), 2.0)],
        [("a", TS(5), 100.0), ("a", TS(15), 200.0), ("a", TS(25), 300.0)],
    )
    assert res[("a", TS(10))] == (TS(15), 200.0)
    assert res[("a", TS(20))] == (TS(25), 300.0)


def test_asof_forward_inclusive_and_tie_break(spark):
    # equal ts matches; among right rows tied on ts the greatest payload wins
    res = _run_fwd(
        spark,
        [("a", TS(10), 1.0)],
        [("a", TS(10), 41.0), ("a", TS(10), 42.0)],
    )
    assert res[("a", TS(10))] == (TS(10), 42.0)


def test_asof_forward_tolerance_nulls_far_matches(spark):
    left = [("a", TS(0), 1.0), ("a", TS(100), 2.0)]
    right = [("a", TS(30), 9.0), ("a", TS(200), 8.0)]
    res = _run_fwd(spark, left, right, tolerance=50)
    assert res[("a", TS(0))] == (TS(30), 9.0)       # 30s away, inside 50s
    assert res[("a", TS(100))] == (None, None)       # 100s away, outside
    inner = _run_fwd(spark, left, right, how="inner", tolerance=50)
    assert inner == {("a", TS(0)): (TS(30), 9.0)}


def test_asof_backward_tolerance(spark):
    left = [("a", TS(100), 1.0)]
    right = [("a", TS(10), 9.0)]
    res = _run(spark, left, right)
    assert res[("a", TS(100))] == (TS(10), 9.0)
    from pyspark.sql import functions as F

    left_df = spark.createDataFrame(left, LEFT_SCHEMA)
    right_df = spark.createDataFrame(right, RIGHT_SCHEMA)
    out = asof_join(
        left_df, right_df, on=["k"], left_ts="ts", right_ts="ts",
        right_payload=["rv"], tolerance=F.expr("INTERVAL 30 SECONDS"),
    )
    row = out.collect()[0]
    assert row["asof_ts"] is None and row["asof_rv"] is None


def _run_nearest(spark, left_rows, right_rows, tolerance=None):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(left_rows, LEFT_SCHEMA)
    right = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
    tol = F.expr(f"INTERVAL {tolerance} SECONDS") if tolerance is not None else None
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_payload=["rv"], direction="nearest", tolerance=tol,
    )
    return {(r["k"], r["ts"]): (r["asof_ts"], r["asof_rv"]) for r in out.collect()}


def test_asof_nearest_picks_closer_side(spark):
    res = _run_nearest(
        spark,
        [("a", TS(10), 1.0), ("a", TS(26), 2.0)],
        [("a", TS(0), 100.0), ("a", TS(13), 200.0), ("a", TS(30), 300.0)],
    )
    assert res[("a", TS(10))] == (TS(13), 200.0)   # forward closer (3 < 10)
    assert res[("a", TS(26))] == (TS(30), 300.0)   # forward closer (4 < 13)


def test_asof_nearest_tie_prefers_backward(spark):
    res = _run_nearest(
        spark,
        [("a", TS(10), 1.0)],
        [("a", TS(5), 100.0), ("a", TS(15), 200.0)],
    )
    assert res[("a", TS(10))] == (TS(5), 100.0)


def test_asof_nearest_tolerance_each_side(spark):
    # backward candidate outside tolerance, forward inside -> forward wins
    res = _run_nearest(
        spark,
        [("a", TS(100), 1.0)],
        [("a", TS(0), 100.0), ("a", TS(140), 200.0)],
        tolerance=60,
    )
    assert res[("a", TS(100))] == (TS(140), 200.0)
    # both outside -> null
    res2 = _run_nearest(
        spark,
        [("a", TS(100), 1.0)],
        [("a", TS(0), 100.0), ("a", TS(200), 200.0)],
        tolerance=30,
    )
    assert res2[("a", TS(100))] == (None, None)

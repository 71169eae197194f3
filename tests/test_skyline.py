"""skyline_2d_min vs brute-force dominance on adversarial point sets."""

from __future__ import annotations

import random

from pyspark.sql import types as T

from ohlc_spark_streaming_spark.operators.skyline import skyline_2d_min

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]
)


def brute_skyline(points):
    out = set()
    for i, (pid, x, y) in enumerate(points):
        dominated = any(
            ax < x and ay < y for j, (_, ax, ay) in enumerate(points) if j != i
        )
        if not dominated:
            out.add(pid)
    return out


def run(spark, points, bucket_width=1.0):
    df = spark.createDataFrame(points, SCHEMA)
    got = {r["id"] for r in skyline_2d_min(df, "x", "y", bucket_width).collect()}
    assert got == brute_skyline(points), (sorted(got), points)


def test_skyline_random_points(spark):
    rng = random.Random(42)
    points = [
        (i, round(rng.uniform(0, 10), 2), round(rng.uniform(0, 10), 2))
        for i in range(200)
    ]
    run(spark, points)


def test_skyline_duplicate_x_and_y(spark):
    # ties never dominate (strict dominance on both axes)
    points = [(1, 1.0, 5.0), (2, 1.0, 3.0), (3, 2.0, 3.0), (4, 2.0, 2.0)]
    # 3 is NOT dominated by 2 (same y would be needed strictly less — 2 has
    # smaller x AND same y? no: 2=(1.0,3.0), 3=(2.0,3.0): y not strictly
    # less, so 3 survives); 4 survives (nothing has smaller x AND y).
    run(spark, points)


def test_skyline_bucket_boundary(spark):
    # points straddling bucket edges: dominance must cross buckets
    points = [(1, 0.99, 9.0), (2, 1.01, 8.0), (3, 3.5, 1.0), (4, 7.0, 0.5),
              (5, 8.0, 2.0)]  # 5 dominated by 4 (7.0<8.0, 0.5<2.0)
    run(spark, points, bucket_width=1.0)


def test_skyline_single_bucket_and_wide_bucket(spark):
    points = [(i, float(i), float(10 - i)) for i in range(10)]  # anti-chain
    run(spark, points, bucket_width=100.0)  # all in one bucket
    run(spark, points, bucket_width=0.5)    # one point per bucket


def test_skyline_negative_coordinates(spark):
    # floor-bucketing must order correctly for negative x too
    rng = random.Random(7)
    points = [
        (i, round(rng.uniform(-10, 10), 2), round(rng.uniform(-10, 10), 2))
        for i in range(150)
    ]
    run(spark, points, bucket_width=2.5)


def test_skyline_rejects_nonpositive_bucket_width(spark):
    import pytest

    df = spark.createDataFrame([(1, 1.0, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="bucket_width"):
        skyline_2d_min(df, "x", "y", 0.0)
    with pytest.raises(ValueError, match="bucket_width"):
        skyline_2d_min(df, "x", "y", -1.0)


def test_skyline_preserves_null_x_rows(spark):
    # NULL x is never strictly dominated (no value is strictly < NULL),
    # matching the SQL NOT EXISTS oracle semantics.
    points = [(1, 1.0, 5.0), (2, None, 0.1), (3, 2.0, 1.0), (4, 3.0, 6.0)]
    df = spark.createDataFrame(points, SCHEMA)
    got = {r["id"] for r in skyline_2d_min(df, "x", "y", 1.0).collect()}
    assert got == {1, 2, 3}  # 4 dominated by 3; NULL-x row 2 survives

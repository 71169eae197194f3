"""Grid-blocked distance join vs brute force (negative coords included)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ohlc_spark_streaming_spark.operators.spatial import grid_distance_join

point = st.tuples(
    st.integers(min_value=-500, max_value=500),
    st.integers(min_value=-500, max_value=500),
)


def brute(points, radius):
    out = {}
    for i, (xa, ya) in enumerate(points):
        for j in range(i + 1, len(points)):
            xb, yb = points[j]
            d = (xa - xb) ** 2 + (ya - yb) ** 2
            if d <= radius * radius:
                out[(i, j)] = d
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(point, min_size=2, max_size=40), st.sampled_from([1, 7, 100]))
def test_grid_join_equals_brute_force(spark, points, radius):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)],
        "id long, x long, y long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist_sq"]
        for r in grid_distance_join(df, radius=radius).collect()
    }
    assert got == brute(points, radius), (radius, points)


def test_zero_radius_rejected(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError, match="radius"):
        grid_distance_join(df, radius=0)

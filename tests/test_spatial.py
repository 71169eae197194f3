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

# Tight grid: duplicates and co-located points are LIKELY, exercising the
# distinct-location collapse + membership expansion path.
dense_point = st.tuples(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=4),
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


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(dense_point, min_size=2, max_size=25), st.sampled_from([1, 3]))
def test_grid_join_with_heavy_duplication(spark, points, radius):
    """Co-located duplicate points must pair exactly once each (the
    collapse/expand path): every duplicate pair has dist_sq 0 and every
    cross pair appears once regardless of multiplicity."""
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


def test_huge_coordinates_beyond_double_precision(spark):
    """Cell ids use exact integer floor division (pmod + div), so points
    with |coordinate| > 2^53 — where floor(x / r) computed through
    doubles misbins — still pair up correctly (ADVICE r5)."""
    big = 2**60  # far beyond double's exact-integer range
    pts = [
        (0, big, big),
        (1, big + 3, big + 4),  # dist² = 25, within radius 7
        (2, big + 700, big),  # far away
        (3, -big, -big),
        (4, -big - 6, -big),  # dist² = 36, within radius 7 (negative side)
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (r["id_a"], r["id_b"]): r["dist_sq"]
        for r in grid_distance_join(df, radius=7).collect()
    }
    assert got == {(0, 1): 25, (3, 4): 36}

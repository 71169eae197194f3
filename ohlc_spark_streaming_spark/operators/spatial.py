"""Spatial operators: grid-blocked distance joins.

The spatial self-join — "all pairs of points within distance r" — is the
geo twin of the near-dup pair problem, and it scales the same way: never
compare all pairs; block into cells sized to the query radius so every
qualifying pair shares a (cell, neighbor-cell) key, then verify the
exact predicate inside the bounded candidate set. One side expands to
its 3×3 cell neighborhood (9 rows per point), the other stays put, and
the cell equi-join is an ordinary hash shuffle — the plan a 100 TB
points table wants, with AQE handling dense-city cell skew.

Coordinates here are INTEGERS (sensor grids, fixed-point lat/lon,
rasterized coordinates): the distance predicate is exact integer
arithmetic, bit-identical in every engine — no trig, no floating-point
ulp drift, which is what makes the operator DuckDB-oracle-checkable.
(Great-circle distance would add sin/cos whose libm bits differ across
engines; at fixed-point precision the planar approximation is the
standard first filter anyway.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_distance_join(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All unordered point pairs with euclidean distance ≤ ``radius``.

    Returns (id_a, id_b, dist_sq) with id_a < id_b; ``dist_sq`` is the
    exact integer squared distance. Cell size = radius, so a qualifying
    pair's cells differ by at most 1 in each axis; the probe side
    explodes to its 9 neighbor cells and equi-joins the build side's
    home cell — every qualifying pair is generated exactly once (the
    build point's home cell is unique).
    """
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius!r}")
    rr = int(radius)

    def cell(col: str):
        # Exact integer FLOOR division at any bigint magnitude: subtract
        # the positive modulus (pmod ∈ [0, r)) and divide the now-exact
        # multiple with integral `div`. floor(x / r) through doubles
        # would misbin |x| > 2^53 and silently drop qualifying pairs.
        return F.expr(f"({col} - pmod({col}, {rr})) div {rr}")

    p = points.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    home = p.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("_bx"),
        F.col("_y").alias("_by"),
        cell("_x").alias("_cx"),
        cell("_y").alias("_cy"),
    )
    offsets = F.expr(
        "explode(array(-1,0,1))"
    )
    probe = (
        p.select(
            F.col("_id").alias("id_a"),
            F.col("_x").alias("_ax"),
            F.col("_y").alias("_ay"),
            cell("_x").alias("_hx"),
            cell("_y").alias("_hy"),
        )
        .select("id_a", "_ax", "_ay", "_hx", "_hy", offsets.alias("_dx"))
        .select(
            "id_a",
            "_ax",
            "_ay",
            (F.col("_hx") + F.col("_dx")).alias("_cx"),
            "_hy",
            F.expr("explode(array(-1,0,1))").alias("_dy"),
        )
        .select(
            "id_a", "_ax", "_ay", "_cx",
            (F.col("_hy") + F.col("_dy")).alias("_cy"),
        )
    )
    dist_sq = (F.col("_ax") - F.col("_bx")) * (
        F.col("_ax") - F.col("_bx")
    ) + (F.col("_ay") - F.col("_by")) * (F.col("_ay") - F.col("_by"))
    return (
        probe.join(home, ["_cx", "_cy"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist_sq.alias("dist_sq"))
        .where(F.col("dist_sq") <= F.lit(int(radius) * int(radius)))
    )

"""Spatial operators: grid-blocked distance joins.

The spatial self-join — "all pairs of points within distance r" — is the
geo twin of the near-dup pair problem, and it scales the same way: never
compare all pairs; block into cells sized to the query radius so every
qualifying pair shares a (cell, neighbor-cell) key, then verify the
exact predicate inside the bounded candidate set. One side expands to
its 3×3 cell neighborhood (9 rows per point), the other stays put, and
the cell equi-join is an ordinary hash shuffle — the plan a 100 TB
points table wants, with AQE handling dense-city cell skew.

Like every pairwise operator in this engine (near-dup, fuzzy match,
embedding cosine), the candidate join runs over DISTINCT content — here
distinct (x, y) locations — and id pairs are expanded afterwards through
output-bound membership joins. Without the collapse, k co-located
duplicates cost k² inside the verification join; with it they cost one
location pair plus exactly the output rows the semantics demand (the 10×
duplication sweep in SCALE.md is the regression harness for this).

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
    exact integer squared distance. Three phases:

    1. **Collapse**: distinct (x, y) locations (duplicate points are the
       spatial twin of duplicate documents — never pair them raw).
    2. **Grid candidate join over locations**: cell size = radius, so a
       qualifying pair's cells differ by at most 1 per axis; the probe
       side explodes to its 9 neighbor cells and equi-joins the build
       side's home cell — every qualifying LOCATION pair is generated
       exactly once (the build location's home cell is unique). A
       location's self-pair (dist 0) is included, carrying the co-located
       id pairs.
    3. **Expansion**: two membership equi-joins fan location pairs back
       out to id pairs — output-bound by construction (each produced row
       is an emitted result row; the ``id_a < id_b`` filter halves the
       symmetric cases in-stage).
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
    # Phase 1: distinct locations; members keep the id ↔ location map.
    locs = p.select("_x", "_y").distinct()
    home = locs.select(
        F.col("_x").alias("_bx"),
        F.col("_y").alias("_by"),
        cell("_x").alias("_cx"),
        cell("_y").alias("_cy"),
    )
    probe = (
        locs.select(
            F.col("_x").alias("_ax"),
            F.col("_y").alias("_ay"),
            cell("_x").alias("_hx"),
            cell("_y").alias("_hy"),
        )
        .select(
            "_ax", "_ay", "_hx", "_hy",
            F.expr("explode(array(-1,0,1))").alias("_dx"),
        )
        .select(
            "_ax", "_ay", "_hy",
            (F.col("_hx") + F.col("_dx")).alias("_cx"),
            F.expr("explode(array(-1,0,1))").alias("_dy"),
        )
        .select(
            "_ax", "_ay", "_cx",
            (F.col("_hy") + F.col("_dy")).alias("_cy"),
        )
    )
    dist_sq = (F.col("_ax") - F.col("_bx")) * (
        F.col("_ax") - F.col("_bx")
    ) + (F.col("_ay") - F.col("_by")) * (F.col("_ay") - F.col("_by"))
    # Phase 2: location pairs within radius. Keep ONE orientation per
    # unordered location pair (lexicographic), plus the self-pair for
    # co-located ids; orientation is restored during expansion by the
    # id_a < id_b filter (both (a∈A, b∈B) and (a∈B, b∈A) orderings are
    # reachable because the expansion joins A-side members to _a and
    # B-side members to _b of an unordered pair).
    loc_pairs = (
        probe.join(home, ["_cx", "_cy"])
        .where(
            (F.col("_ax") < F.col("_bx"))
            | ((F.col("_ax") == F.col("_bx")) & (F.col("_ay") <= F.col("_by")))
        )
        .select("_ax", "_ay", "_bx", "_by", dist_sq.alias("dist_sq"))
        .where(F.col("dist_sq") <= F.lit(rr * rr))
    )
    # Phase 3: expand to id pairs (output-bound membership joins). A
    # CROSS pair (A ≠ B) contributes every (id at A) × (id at B)
    # combination exactly once (the location pair exists in one
    # orientation), with least/greatest restoring id order. A SELF pair
    # (A == B) would contribute each co-located id pair twice — (i, j)
    # and (j, i) normalize to the same output row — so self pairs are
    # pre-filtered to _ida < _idb instead.
    ma = p.select(
        F.col("_id").alias("_ida"), F.col("_x").alias("_ax"), F.col("_y").alias("_ay")
    )
    mb = p.select(
        F.col("_id").alias("_idb"), F.col("_x").alias("_bx"), F.col("_y").alias("_by")
    )
    is_cross = (F.col("_ax") != F.col("_bx")) | (F.col("_ay") != F.col("_by"))
    return (
        loc_pairs.join(ma, ["_ax", "_ay"])
        .join(mb, ["_bx", "_by"])
        .where(is_cross | (F.col("_ida") < F.col("_idb")))
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "dist_sq",
        )
    )

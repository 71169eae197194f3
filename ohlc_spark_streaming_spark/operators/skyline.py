"""2D skyline (Pareto frontier) via a two-phase distributed prefix min.

A row survives the min-min skyline iff NO other row has BOTH a strictly
smaller x AND a strictly smaller y. The naive formulation is a
quadratic self-join (the oracle we check against); the classic
single-machine trick is "sort by x, keep rows whose y beats the running
min" — but a global sort-window is one partition.

This operator distributes the running min the same way
``operators/packing.py`` distributes its prefix sum:

1. collapse to one row per distinct x (``min(y)`` per x) — hash shuffle
   with map-side partials;
2. range-bucket x (``floor(x / bucket_width)``); per-bucket ``min(y)``
   is a TINY table, and its strict-prefix running min (the only global
   window) runs over #buckets rows, not #rows;
3. inside each bucket, a PARTITIONED window gives the strict-prefix
   running min over the per-x rows;
4. the dominance threshold for x is ``least(local_prefix, bucket_
   prefix)``, joined back to the input on x — a row is dominated iff
   ``threshold < y``.

Total cost: two hash exchanges + one bounded window; no global sort of
the data, no self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d_min(
    df: DataFrame, x_col: str, y_col: str, bucket_width: float
) -> DataFrame:
    """Rows of ``df`` not strictly dominated in (min ``x_col``, min
    ``y_col``); all input columns pass through.

    NULL ``x_col`` rows are preserved: a NULL x can never be strictly
    dominated (no x compares strictly smaller than NULL under the stated
    semantics), so they are passed through untouched rather than fed to
    the bucketed join.
    """
    if not bucket_width > 0:
        raise ValueError(
            f"bucket_width must be > 0, got {bucket_width!r}"
        )
    null_x = df.where(F.col(x_col).isNull())
    df = df.where(F.col(x_col).isNotNull())
    per_x = (
        df.groupBy(x_col)
        .agg(F.min(y_col).alias("_ymin"))
        .withColumn("_bkt", F.floor(F.col(x_col) / F.lit(bucket_width)))
    )

    # Phase 1: strict-prefix min over buckets (tiny: one row per bucket).
    bkt = per_x.groupBy("_bkt").agg(F.min("_ymin").alias("_bmin"))
    wb = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bkt_prefix = bkt.select(
        "_bkt", F.min("_bmin").over(wb).alias("_bucket_prefix")
    )

    # Phase 2: strict-prefix min inside each bucket (distributed window).
    wl = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(x_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    thresholds = (
        per_x.withColumn("_local_prefix", F.min("_ymin").over(wl))
        .join(F.broadcast(bkt_prefix), "_bkt")
        # least() skips nulls; null means "no strictly-smaller x exists".
        .select(
            x_col,
            F.least("_local_prefix", "_bucket_prefix").alias("_thr"),
        )
    )

    dominated: Column = F.col("_thr").isNotNull() & (
        F.col("_thr") < F.col(y_col)
    )
    survivors = (
        df.join(thresholds, x_col)
        .where(~dominated)
        .drop("_thr")
    )
    return survivors.unionByName(null_x.select(survivors.columns))

"""Distributed global ordering: row_number / ntile without a global window.

A ``Window.orderBy(...)`` with no ``partitionBy`` funnels the whole input
through ONE window partition — the classic single-partition scale-killer.
These helpers compute the same answers with the two-phase layout also used
by ``operators.packing``:

1. ``repartitionByRange`` on the order columns (sampled boundaries —
   partition *contents* vary run to run, the final rank never does, because
   the order columns form a total order),
2. per-partition ``row_number`` (parallel windows inside each range),
3. per-partition counts (one tiny row each) prefix-summed and broadcast
   back as exclusive offsets; global rank = offset + local rank.

The only unpartitioned window runs over the O(#partitions) totals table.
``ntile`` is then pure arithmetic on (rank, total): with ``N`` rows and
``k`` buckets, the first ``N mod k`` buckets hold ``ceil(N/k)`` rows and
the rest ``floor(N/k)`` — exactly Spark's/DuckDB's ntile semantics.

Reference scope: the reference (221-line streaming OHLC app,
/root/reference/main.py) has no ranking surface; this is the scale path
for SURVEY §2.6's global-order analytics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """Attach a 1-based global ``row_number`` over ``order_cols`` (which
    must form a total order for the result to be deterministic) without a
    single-partition window. Optionally also attach the total row count as
    ``total_col`` (piggybacks on the same tiny totals table — no extra
    pass over the data).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    t = df.repartitionByRange(*cols).withColumn("_pid", F.spark_partition_id())
    local = Window.partitionBy("_pid").orderBy(*cols)
    t = t.withColumn("_local_rn", F.row_number().over(local).cast("long"))

    # Tiny table: one row per partition. The unpartitioned windows below
    # are O(#partitions), not O(rows) — same bound as packing's phase 3.
    totals = t.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0))
    )
    if total_col is not None:
        all_w = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offsets = offsets.withColumn(total_col, F.sum("_cnt").over(all_w))
    keep = ["_pid", "_off"] + ([total_col] if total_col else [])
    out = t.join(F.broadcast(offsets.select(*keep)), "_pid").withColumn(
        rank_col, (F.col("_off") + F.col("_local_rn")).cast("long")
    )
    return out.drop("_pid", "_local_rn", "_off")


def ntile_expr(rank_col: str, total_col: str, n_buckets: int) -> Column:
    """``ntile(n)`` as arithmetic on a global rank: the first ``N mod n``
    buckets get ``floor(N/n)+1`` rows, the remainder ``floor(N/n)`` —
    bit-identical to the window function, no window required."""
    n = F.lit(int(n_buckets)).cast("long")
    rn = F.col(rank_col)
    total = F.col(total_col)
    big = total % n  # number of larger buckets
    size_big = F.floor(total / n) + F.lit(1)
    # greatest(,1) guards the (unreachable when rn > big*size_big) divide
    # when N < n makes the small-bucket size 0.
    size_small = F.greatest(F.floor(total / n), F.lit(1))
    in_big = rn <= big * size_big
    return (
        F.when(in_big, F.floor((rn - 1) / size_big) + 1)
        .otherwise(big + F.floor((rn - big * size_big - 1) / size_small) + 1)
        .cast("int")
    )


def with_group_rank(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    rank_col: str = "rn",
) -> DataFrame:
    """Attach a 1-based per-group ``row_number`` (partition by
    ``group_cols``, order by ``order_cols``) WITHOUT
    ``Window.partitionBy`` — which hashes each whole group onto one
    task and melts under a dominant group (one length bucket, one
    boilerplate source) at 100 TB.

    Layout: ONE two-phase global rank over ``group_cols + order_cols``
    (so a dominant group spreads across all range partitions), then the
    per-group rank is pure arithmetic: global rank minus the group's
    min rank + 1. The min-rank table has one row per group — bounded by
    group cardinality, not data volume — and is broadcast. Requires the
    concatenated columns to form a total order (same contract as
    :func:`with_global_rank`); group cardinality must be broadcast-safe,
    which is the declared regime (length buckets, sources, symbols).
    """
    gcols = [F.col(c) if isinstance(c, str) else c for c in group_cols]
    names = [c if isinstance(c, str) else None for c in group_cols]
    if any(n is None for n in names):
        raise ValueError("with_group_rank needs named group columns")
    ranked = with_global_rank(df, gcols + list(order_cols), rank_col="_grn")
    mins = ranked.groupBy(*[F.col(n).alias(f"_g_{n}") for n in names]).agg(
        F.min("_grn").alias("_gmin")
    )
    cond = None
    for n in names:
        # Null-safe: a NULL group key is a group like any other under
        # Window.partitionBy semantics; plain == would drop its rows
        # through the inner join.
        c = ranked[n].eqNullSafe(mins[f"_g_{n}"])
        cond = c if cond is None else (cond & c)
    out = ranked.join(F.broadcast(mins), cond, "inner").withColumn(
        rank_col, (F.col("_grn") - F.col("_gmin") + 1).cast("long")
    )
    return out.drop("_grn", "_gmin", *[f"_g_{n}" for n in names])

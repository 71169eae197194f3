"""Session-window aggregation (SURVEY.md §2.9 ST2 family extension).

The reference uses only tumbling windows (/root/reference/main.py:162);
session windows are the third member of Spark's event-time window family
(tumbling / sliding / session) and the natural fit for user-activity
sessionization. ``F.session_window(ts, gap)`` works identically in batch
and streaming; in streaming it is a merging-state stateful operator whose
state is bounded by the watermark.

Semantics (what the DuckDB gaps-and-islands oracle must mirror): an event
extends the current session iff it arrives strictly within ``gap`` of the
previous event (``diff < gap`` merges, ``diff >= gap`` splits — windows are
end-exclusive ``[first_ts, last_ts + gap)``).

Scale note: sessionization shuffles once on the session key; per-key state
is O(1) scalars (min/max/sum/count), never a buffered event list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "4 hours",
    value_scale: int = 6,
) -> DataFrame:
    """One row per (key, session): bounds, event count, exact-decimal value sum.

    Output: ``session_start``, ``session_end`` (= last event + gap),
    ``key_col``, ``n_events``, ``sum_value``.
    """
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Exact decimal sum → order-independent double (registry note).
            F.sum(F.col(value_col).cast(f"decimal(30,{value_scale})"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def interval_union(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping/touching CLOSED integer intervals per key into
    maximal islands — the interval generalization of sessionization
    (points + gap TTL ⊂ variable-length intervals + overlap).

    "Touching" uses closed-integer adjacency: [2,3] and [4,9] merge
    (no uncovered unit between them), so an island's span equals its
    distinct covered units and Σ(end−start+1) over islands is EXACTLY
    the key's covered-unit count.

    Returns one row per (key, island): island_start, island_end,
    n_intervals. Classic sweep re-expressed as two window layers over
    ONE (key, start, end) sort exchange: a running max of prior ends
    marks island starts (start > max-so-far + 1 ⇒ new island), a
    running sum of the flags numbers the islands, then an ordinary
    groupBy collapses each island. Per-key window partitions keep
    every stage parallel; no single-partition window.

    Deterministic under ties by construction: rows are DISTINCT
    (union is a set operation) and ordered by (start, end); rows
    sharing a start can't open a new island in any order (their
    start ≤ every tied row's end), so flags — and therefore island
    ids and the final aggregates — are order-independent.
    """
    iv = intervals.select(
        F.col(key_col).alias("_k"),
        F.col(start_col).alias("_st"),
        F.col(end_col).alias("_en"),
    ).distinct()
    w_prev = (
        Window.partitionBy("_k")
        .orderBy("_st", "_en")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("_k")
        .orderBy("_st", "_en")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn("_pmax", F.max("_en").over(w_prev)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("_pmax").isNull() | (F.col("_st") > F.col("_pmax") + 1),
                1
            ).otherwise(0)
        ).over(w_run),
    )
    return flagged.groupBy(
        F.col("_k").alias(key_col), F.col("island").alias("island")
    ).agg(
        F.min("_st").alias("island_start"),
        F.max("_en").alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )

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

from pyspark.sql import DataFrame
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

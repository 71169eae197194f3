"""Streaming OHLC candles — the reference's production query, generalized.

Reference (/root/reference/main.py:160-170): watermark (default 2 minutes)
+ tumbling window (default 1 minute) per base symbol, update output mode.

Our engine uses the same aggregate expressions as the batch twin
(operators.ohlc.ohlc_aggregates) so batch↔stream parity is by construction;
the efficient struct-min/max form keeps streaming state at O(1) per
(window, symbol) key — the reference's collect_list state is O(#trades) per
key, which is the single biggest obstacle to running this at 100 TB
(SURVEY.md §4.3).

Output modes (SURVEY §2.9 ST3):
* ``update``  — reference behavior: partial candles re-emitted every
  micro-batch as trades arrive; downstream keeps last per (window, base).
* ``append``  — emit-once-final: a candle appears only after the watermark
  passes its window end; trailing windows are withheld on a bounded replay.
* ``complete``— full result each trigger (bounded replays / tests only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ohlc import ohlc_aggregates


def streaming_ohlc_candles(
    stream: DataFrame,
    ts_col: str = "timestamp",
    symbol_col: str = "base",
    price_col: str = "price",
    qty_col: str | None = "quantity",
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark_delay: str = "2 minutes",
    mode: str = "efficient",
) -> DataFrame:
    """Watermarked tumbling- (or sliding-, when ``slide`` is set)
    window OHLCV aggregation over a stream."""
    window = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            window.alias("window"),
            F.col(symbol_col).alias("symbol"),
        )
        .agg(*ohlc_aggregates(ts_col, price_col, qty_col, mode))
        .select(
            # NTZ output for oracle/batch parity (event time itself must be
            # TIMESTAMP for the watermark; session TZ is pinned UTC).
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            F.col("window.end").cast("timestamp_ntz").alias("window_end"),
            "symbol",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_trades",
        )
    )


def stream_state_partitions() -> int:
    """Shuffle-partition count for stateful streaming queries.

    Stateful operators pay a per-partition state-store cost (open, delta
    write, snapshot maintenance) every micro-batch, so the partition count
    should track state volume, not core count: cores/8 with a floor of 4
    (local[32] → 4 stores; a 1000-core cluster → 125; measured best on the
    bench corpus — 8 stores cost ~2x the wall time of 4 at sf0.1 state
    sizes). Batch queries keep the full ``spark.sql.shuffle.partitions``.
    Override with ``SPARK_GRAFT_STREAM_PARTITIONS``.
    """
    import os

    env = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    from ..session import default_parallelism

    return max(4, default_parallelism() // 8)


def run_to_memory(
    stream_df: DataFrame,
    table_name: str,
    output_mode: str = "complete",
    partitions: int | None = None,
) -> DataFrame:
    """Execute a (bounded) streaming DataFrame to completion into an
    in-memory table via availableNow, returning the result table.

    This is the test/oracle harness for streaming operators: availableNow
    processes all available input then stops, so the memory table holds the
    stream's final answer. Spark session must own the stream's source.

    ``spark.sql.shuffle.partitions`` is narrowed to
    :func:`stream_state_partitions` for the duration of the start (the
    value is captured into the query's checkpoint at planning time), then
    restored so batch queries keep their own sizing. Queries whose
    stateful stage runs PYTHON (applyInPandasWithState) should pass an
    explicit ``partitions`` near the core count instead — their cost is
    Python-worker parallelism, not state-store count (measured: the
    stateful counter is 2x slower at 4 partitions than at 16).
    """
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(partitions if partitions else stream_state_partitions()),
    )
    try:
        query = (
            stream_df.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(table_name)

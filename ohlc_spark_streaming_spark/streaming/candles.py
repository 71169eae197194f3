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


def run_to_memory(
    stream_df: DataFrame,
    table_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a (bounded) streaming DataFrame to completion into an
    in-memory table via availableNow, returning the result table.

    This is the test/oracle harness for streaming operators: availableNow
    processes all available input then stops, so the memory table holds the
    stream's final answer. Spark session must own the stream's source.
    """
    spark = stream_df.sparkSession
    query = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)

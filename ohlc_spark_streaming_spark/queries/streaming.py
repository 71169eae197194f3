"""Streaming queries exposed through the driver contract.

Each runs a genuine Structured Streaming query (file source → watermarked
windowed aggregation → memory sink) to completion with
``trigger(availableNow=True)`` and returns the final table. The flagship
streaming candle query reuses the batch OHLC oracle: complete-mode output
over a bounded replay must equal the batch answer exactly — streaming
correctness is hash-checked, not eyeballed (unlike the reference's console
sinks, /root/reference/main.py:90-99)."""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.stream import events_stream
from ..streaming.candles import run_to_memory, streaming_ohlc_candles
from .reference import _OHLC_ORACLE

_counter = itertools.count()


@register("streaming_ohlc_candles", _OHLC_ORACLE)
def q_streaming_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the flagship: events replayed as a file stream,
    watermark + tumbling hourly window, complete output mode, availableNow.

    Same aggregate expressions as the batch operator (by construction), so
    the batch oracle applies verbatim."""
    stream = events_stream(spark, sf_dir)
    candles = streaming_ohlc_candles(
        stream,
        ts_col="ts",
        symbol_col="event_type",
        price_col="value",
        qty_col=None,
        window_duration="1 hour",
        watermark_delay="2 minutes",
    )
    name = f"stream_ohlc_result_{next(_counter)}"
    return run_to_memory(candles, name, output_mode="complete")

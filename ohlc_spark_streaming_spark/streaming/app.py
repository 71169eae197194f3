"""The reference application, recomposed (/root/reference/main.py:70-221).

The reference's ``main()`` wires: Kafka source → parse → typed cast → base
derivation → watermarked 1-minute OHLCV per base → JSON candle rows routed
to per-symbol output topics, plus four console debug taps, five concurrent
queries total, blocking on any termination.

:func:`build_app` reproduces that topology against ANY source DataFrame
(Kafka in production, file stream in tests) with assertable sinks instead
of console prints, per-query checkpoint isolation (main.py:201-206), and
the engine's O(1)-state candle aggregation. The reference's physical
inefficiency — five independent source subscriptions (SURVEY §4.4) — is
kept OUT: taps share the one parsed stream, so the source is consumed
once per query only where Spark requires it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.trades import serialize_candles, trades_from_wire
from .candles import stream_state_partitions, streaming_ohlc_candles
from .checkpoints import CheckpointManager


@dataclass
class TradeCandleApp:
    """Handles for the started queries; `await_any` mirrors main.py:221."""

    candle_query: StreamingQuery
    tap_queries: list[StreamingQuery]

    def await_any(self) -> None:
        spark = None
        for q in [self.candle_query, *self.tap_queries]:
            spark = q.sparkSession if hasattr(q, "sparkSession") else spark
        (spark or self.candle_query.sparkSession).streams.awaitAnyTermination()

    def stop(self) -> None:
        for q in [self.candle_query, *self.tap_queries]:
            q.stop()


def build_app(
    wire: DataFrame,
    checkpoints: CheckpointManager,
    output_prefix: str = "candles-",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    with_taps: bool = True,
    sink_format: str = "memory",
    available_now: bool = False,
) -> TradeCandleApp:
    """Start the full candle application over a wire-format stream
    (columns: ``topic``, ``value``). Returns running query handles.

    ``sink_format='memory'`` makes every sink an assertable table
    (candles_out, tap_trades, tap_raw); production passes ``kafka`` plus
    the broker options via the returned writers instead.
    """
    spark = wire.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(stream_state_partitions()))
    try:
        trades = trades_from_wire(wire)
        trades_ts = trades.withColumn(
            "timestamp", trades["timestamp"].cast("timestamp")
        )
        candles = streaming_ohlc_candles(
            trades_ts,
            ts_col="timestamp",
            symbol_col="base",
            price_col="price",
            qty_col="quantity",
            window_duration=window_duration,
            watermark_delay=watermark_delay,
        )
        out_rows = serialize_candles(candles, output_prefix)

        def _start(df: DataFrame, name: str, mode: str) -> StreamingQuery:
            w = (
                df.writeStream.format(sink_format)
                .queryName(name)
                .outputMode(mode)
                .option("checkpointLocation", checkpoints.path_for(name))
            )
            if available_now:
                w = w.trigger(availableNow=True)
            return w.start()

        candle_q = _start(out_rows, "candles_out", "update")
        taps: list[StreamingQuery] = []
        if with_taps:
            taps.append(_start(wire.select("topic", "value"), "tap_raw", "append"))
            taps.append(_start(trades, "tap_trades", "append"))
        return TradeCandleApp(candle_query=candle_q, tap_queries=taps)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

"""Round-9 streaming additions: event-time-timer sessionization.

The registry sweep proves bounded-replay equality with the batch session
oracle; these tests pin what the sweep can't see: the pure fold kernel's
close rules, timers firing for sessions whose events span MULTIPLE
micro-batches (time-sliced tape), and the empirically-probed TTL
contract extension — ``ttlDurationMs`` is ILLEGAL under
timeMode="EventTime" too (ProcessingTime-only), so event-time timer
eviction is this harness's only deterministic face of state expiry.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ohlc_spark_streaming_spark import registry
from ohlc_spark_streaming_spark._compat import ensure_protobuf
from ohlc_spark_streaming_spark.sources.batch import load_table
from ohlc_spark_streaming_spark.streaming.stateful import (
    SESSION_GAP_US,
    _session_fold,
    tws_session_timers,
)

from .conftest import SF_SMOKE

needs_protobuf = pytest.mark.skipif(
    not ensure_protobuf(),
    reason="transformWithState needs google.protobuf and no pure-python "
    "runtime was found on this machine (_compat.ensure_protobuf)",
)

GAP = SESSION_GAP_US
HOUR = 3600 * 1_000_000


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_session_fold_kernel():
    """In-gap events extend; a gap-or-more successor closes the open
    session at input time; state carries across calls."""
    closed, cur = _session_fold([0, HOUR, HOUR + GAP], [10, 20, 5], None)
    assert closed == [(0, HOUR, 2, 30)]
    assert cur == (HOUR + GAP, HOUR + GAP, 1, 5)
    # state from a previous batch extends when the next batch is in-gap
    closed, cur = _session_fold([HOUR + GAP + HOUR], [7], cur)
    assert closed == []
    assert cur == (HOUR + GAP, HOUR + GAP + HOUR, 2, 12)
    # exact-gap boundary closes (oracle: diff >= gap splits)
    closed, cur = _session_fold([cur[1] + GAP], [1], cur)
    assert closed == [(HOUR + GAP, HOUR + GAP + HOUR, 2, 12)]
    assert cur[2] == 1


def _sentinel_tape(spark, tmp_path, ev, n_files):
    """Time-range-sliced tape (sessions span micro-batches) plus the
    watermark-advancing sentinel as the final file.

    The slabs are written SEQUENTIALLY with explicitly spaced mtimes: the
    file source replays files in modification-time order, and a single
    repartitionByRange write stamps all slab files within the same
    instant — an out-of-time-order replay makes earlier slabs late
    beyond the watermark and the event-time operator silently drops
    them (observed: early sessions missing, split sessions merged)."""
    import os

    tape = str(tmp_path / "tape")
    lo, hi = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (hi - lo) / n_files
    for i in range(n_files):
        a = lo + i * span
        b = hi + datetime.timedelta(seconds=1) if i == n_files - 1 else lo + (i + 1) * span
        ev.where((F.col("ts") >= F.lit(a)) & (F.col("ts") < F.lit(b))).coalesce(
            1
        ).write.mode("append").parquet(tape)
    sentinel_ts = hi + datetime.timedelta(hours=4, minutes=2, seconds=1)
    spark.createDataFrame(
        [(-1, sentinel_ts, -1, 0.0)],
        "event_id long, ts timestamp_ntz, user_id long, value double",
    ).coalesce(1).write.mode("append").parquet(tape)
    # strictly increasing mtimes in write (= time) order
    parts = sorted(
        (os.path.getmtime(os.path.join(tape, f)), f)
        for f in os.listdir(tape)
        if f.endswith(".parquet")
    )
    for k, (_m, f) in enumerate(parts):
        os.utime(os.path.join(tape, f), (1_000_000 + 10 * k,) * 2)
    schema = spark.read.parquet(tape).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tape)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 minutes")
    )


@needs_protobuf
def test_session_timers_across_batches(tmp_path, spark):
    """A 4-slab time-sliced tape: sessions that straddle slab boundaries
    must be EXTENDED across micro-batches (not closed early by the
    watermark racing ahead), and every final session must be emitted by
    its registered event-time timer in the drain batch — equality with
    the batch gaps-and-islands operator proves both."""
    from ohlc_spark_streaming_spark.queries.streaming import (
        _run_tws,
        session_timers_rollup,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    stream = _sentinel_tape(spark, tmp_path, ev, n_files=4)
    log = _run_tws(
        spark,
        lambda: tws_session_timers(stream),
        "tws_session_tape",
        "append",
    )
    got = session_timers_rollup(log)
    want = registry.QUERIES["session_windows_user"](spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


@needs_protobuf
def test_ttl_illegal_under_event_time(tmp_path, spark):
    """Pin the probed contract: ttlDurationMs is ProcessingTime-only —
    assigning TTL in timeMode="EventTime" fails with
    STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL (as it does
    under "None", tests/test_streaming_round8.py). Consequence: no
    deterministic positive TTL exhibit exists on a bounded tape (the
    ProcessingTime mode never drains); timer-driven eviction is the
    event-time replacement."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from ohlc_spark_streaming_spark.queries.streaming import _run_tws

    class _TTLProbe(StatefulProcessor):
        def init(self, handle):
            handle.getValueState("x", "x long", ttlDurationMs=60_000)

        def handleInputRows(self, key, rows, timerValues):
            for _ in rows:
                pass
            yield pd.DataFrame({"user_id": [key[0]]})

        def close(self):
            pass

    src = str(tmp_path / "one")
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "user_id long, ts timestamp_ntz"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def build():
        return (
            spark.readStream.schema(schema)
            .parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 minute")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_TTLProbe(),
                outputStructType="user_id long",
                outputMode="Append",
                timeMode="EventTime",
            )
        )

    with pytest.raises(Exception, match="TIME_MODE_TO_ASSIGN_TTL"):
        _run_tws(spark, build, "tws_ttl_eventtime_probe", "append")


def test_chained_dedup_candles_negative_control(spark):
    """The chained query's oracle equality is only meaningful if the
    duplicates were real: WITHOUT the dedup stage the doubled delivery
    must double volume/n_trades (and the chained registry entry must
    equal the batch flagship exactly)."""
    from ohlc_spark_streaming_spark.operators.ohlc import ohlc_aggregates
    from ohlc_spark_streaming_spark.sources.stream import events_stream
    from ohlc_spark_streaming_spark.streaming.candles import run_to_memory

    chained = registry.QUERIES["streaming_dedup_then_candles"](
        spark, SF_SMOKE
    )
    batch = registry.QUERIES["ohlc_candles"](spark, SF_SMOKE)
    assert _rows(chained) == _rows(batch)

    dup = events_stream(spark, SF_SMOKE).unionByName(
        events_stream(spark, SF_SMOKE)
    )
    no_dedup = (
        dup.withWatermark("ts", "2 minutes")
        .groupBy(
            F.window(F.col("ts"), "1 hour").alias("window"),
            F.col("event_type").alias("symbol"),
        )
        .agg(*ohlc_aggregates("ts", "value", None, "efficient"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("ws"),
            "symbol",
            "volume",
        )
    )
    doubled = run_to_memory(no_dedup, "chain_neg_ctl", output_mode="complete")
    vol = {(r.ws, r.symbol): r.volume for r in doubled.collect()}
    want = {
        (r.window_start, r.symbol): r.volume for r in batch.collect()
    }
    assert vol == {k: 2 * v for k, v in want.items()}

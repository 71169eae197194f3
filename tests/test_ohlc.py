"""OHLC candle semantics: tie-breaks, faithful≡efficient, schema contract."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .conftest import SF_SMOKE

from ohlc_spark_streaming_spark.operators.ohlc import OHLC_COLUMNS, ohlc_candles

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("qty", T.DoubleType()),
    ]
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s), sym, p, q)
            for s, sym, p, q in rows
        ],
        SCHEMA,
    )


def test_tie_breaks_match_reference(spark):
    """Reference tie-breaks (SURVEY §2.4): open = lowest price within the
    earliest timestamp; close = highest price within the latest timestamp
    (lexicographic (t, p) struct ordering, /root/reference/main.py:153-158)."""
    df = _mk(
        spark,
        [
            (0, "btc", 5.0, 1.0),
            (0, "btc", 3.0, 1.0),  # same earliest ts, lower price → open
            (30, "btc", 9.0, 1.0),
            (59, "btc", 2.0, 1.0),
            (59, "btc", 7.0, 1.0),  # same latest ts, higher price → close
        ],
    )
    for mode in ("efficient", "faithful"):
        row = ohlc_candles(
            df, ts_col="ts", symbol_col="symbol", price_col="price",
            qty_col="qty", window_duration="1 minute", mode=mode,
        ).collect()[0]
        assert row["open"] == 3.0, mode
        assert row["close"] == 7.0, mode
        assert row["high"] == 9.0 and row["low"] == 2.0
        assert row["volume"] == 5.0 and row["n_trades"] == 5


def test_modes_agree_on_real_data(spark):
    from ohlc_spark_streaming_spark.sources.batch import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    kw = dict(ts_col="ts", symbol_col="event_type", price_col="value",
              window_duration="1 hour")
    eff = ohlc_candles(ev, mode="efficient", **kw)
    fai = ohlc_candles(ev, mode="faithful", **kw)
    assert eff.columns == list(OHLC_COLUMNS)
    a = sorted(map(tuple, eff.collect()))
    b = sorted(map(tuple, fai.collect()))
    assert a == b


def test_multiple_symbols_and_windows(spark):
    df = _mk(
        spark,
        [(0, "a", 1.0, 1.0), (61, "a", 2.0, 1.0), (0, "b", 10.0, 2.0)],
    )
    out = ohlc_candles(
        df, ts_col="ts", symbol_col="symbol", price_col="price",
        qty_col="qty", window_duration="1 minute",
    )
    rows = {(r["symbol"], r["window_start"].minute): r for r in out.collect()}
    assert len(rows) == 3
    assert rows[("a", 1)]["open"] == 2.0
    assert rows[("b", 0)]["volume"] == 2.0


def test_twap_weights_partition_the_hour(spark):
    """TWAP's correctness bound: per (symbol, window), the microsecond
    weights must sum to EXACTLY (window_end - first_event_ts) — the
    weights tile the interval from the first observation to the window
    edge with no gap or overlap, which is also why the integer weighted
    sum can never overflow."""
    from pyspark.sql import Window as W

    from ohlc_spark_streaming_spark.sources.batch import load_table

    e = load_table(spark, SF_SMOKE, "events")
    ws = F.date_trunc("hour", "ts")
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    end_us = F.unix_micros((ws + F.expr("INTERVAL 1 HOUR")).cast("timestamp"))
    w = W.partitionBy("event_type", "_ws").orderBy("_tsu", "event_id")
    weighted = (
        e.select(
            "event_type", "event_id",
            ws.alias("_ws"), tsu.alias("_tsu"), end_us.alias("_end"),
        )
        .withColumn(
            "_wt", F.coalesce(F.lead("_tsu").over(w), F.col("_end")) - F.col("_tsu")
        )
    )
    bad = (
        weighted.groupBy("event_type", "_ws")
        .agg(
            F.sum("_wt").alias("wt_sum"),
            (F.first("_end") - F.min("_tsu")).alias("span"),
        )
        .where(F.col("wt_sum") != F.col("span"))
        .count()
    )
    assert bad == 0


def test_partial_candle_merge_any_partition(spark):
    """The candle monoid: ANY partition of the events (here a 3-way
    event_id split) merges to the exact rows of the direct hourly
    aggregation — including same-window open/close tie-breaks, which is
    what the (ts, price) extrema keys exist for."""
    from ohlc_spark_streaming_spark.operators.ohlc import (
        ohlc_candles,
        ohlc_merge_partials,
        ohlc_partial_candles,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    from .conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")

    def partial(pred):
        return ohlc_partial_candles(
            events.where(pred), ts_col="ts", symbol_col="event_type",
            price_col="value", qty_col=None, window_duration="1 hour",
        )

    from pyspark.sql import functions as F

    parts = [partial(F.col("event_id") % 3 == k) for k in range(3)]
    merged = ohlc_merge_partials(parts[0].unionByName(parts[1]).unionByName(parts[2]))
    direct = ohlc_candles(
        events, ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 hour",
    )
    key = ["window_start", "symbol"]
    m = {tuple(r[k] for k in key): r for r in merged.collect()}
    d = {tuple(r[k] for k in key): r for r in direct.collect()}
    assert set(m) == set(d)
    for k in d:
        assert m[k].asDict() == d[k].asDict(), (k, m[k], d[k])

"""Trade wire pipeline: parse, cast, null-guard, base derivation, serialize."""

from __future__ import annotations

from pyspark.sql import types as T

from ohlc_spark_streaming_spark.operators.trades import (
    parse_trades,
    serialize_candles,
    trades_from_wire,
    typed_trades,
)

RAW_SCHEMA = T.StructType(
    [T.StructField("topic", T.StringType()), T.StructField("value", T.StringType())]
)


def _raw(spark, rows):
    return spark.createDataFrame(rows, RAW_SCHEMA)


def test_malformed_rows_are_dropped(spark):
    """Reference error handling (main.py:127): malformed JSON and
    unparseable timestamps silently drop; nothing throws (ANSI-safe)."""
    df = _raw(
        spark,
        [
            ("parsed-trades-btc-usdt",
             '{"from_symbol":"BTC","timestamp":"1700000000","price":"5.0","quantity":"1.0"}'),
            ("parsed-trades-btc-usdt", "not json at all"),
            ("parsed-trades-btc-usdt",
             '{"from_symbol":"BTC","timestamp":"not-a-number","price":"5.0","quantity":"1"}'),
            ("parsed-trades-btc-usdt",
             '{"from_symbol":"BTC","price":"5.0","quantity":"1"}'),  # missing ts
        ],
    )
    out = trades_from_wire(df).collect()
    assert len(out) == 1
    assert out[0]["base"] == "btc"
    assert out[0]["price"] == 5.0


def test_base_fallback_to_from_symbol(spark):
    df = _raw(
        spark,
        [
            ("some-other-topic",
             '{"from_symbol":"ETH","timestamp":"1700000000","price":"1.0","quantity":"1"}'),
            ("parsed-trades-sol-usdt",
             '{"from_symbol":"IGNORED","timestamp":"1700000000","price":"1.0","quantity":"1"}'),
        ],
    )
    bases = {r["topic"]: r["base"] for r in trades_from_wire(df).collect()}
    assert bases["some-other-topic"] == "ETH"
    assert bases["parsed-trades-sol-usdt"] == "sol"


def test_typed_trades_casts(spark):
    df = _raw(
        spark,
        [("t", '{"timestamp":"1700000000","price":"3.25","quantity":"0.5",'
               '"from_symbol":"a","to_symbol":"usdt"}')],
    )
    row = typed_trades(parse_trades(df)).collect()[0]
    assert row["price"] == 3.25 and row["quantity"] == 0.5
    # 1700000000 = 2023-11-14 22:13:20 UTC
    assert row["timestamp"].isoformat() == "2023-11-14T22:13:20"


def test_serialize_candles_contract(spark):
    from ohlc_spark_streaming_spark.operators.ohlc import ohlc_candles
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 1), "btc", 5.0, 2.0)],
        T.StructType(
            [
                T.StructField("ts", T.TimestampNTZType()),
                T.StructField("sym", T.StringType()),
                T.StructField("price", T.DoubleType()),
                T.StructField("qty", T.DoubleType()),
            ]
        ),
    )
    candles = ohlc_candles(df, ts_col="ts", symbol_col="sym", price_col="price",
                           qty_col="qty", window_duration="1 minute")
    out = serialize_candles(candles, "candles-").collect()[0]
    assert out["topic"] == "candles-btc-usdt"
    assert out["key"] == "btc"
    import json

    payload = json.loads(out["value"])
    assert payload["base"] == "btc"
    assert payload["open"] == 5.0 and payload["volume"] == 2.0
    assert payload["start_ts"].startswith("2024-01-01T00:00:00")

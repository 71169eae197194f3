"""Reference-parity queries: OHLC candles + the trade wire pipeline.

These cover the reference's entire semantic surface
(/root/reference/main.py:70-217) as oracle-checkable batch queries:
JSON parse (P2), typed casts + null guard (P4, P5), base derivation (P6),
windowed OHLCV aggregation (A1-A7), and candle serialization (P7, P8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ohlc import ohlc_candles
from ..operators.trades import trades_from_wire
from ..registry import register
from ..sources.batch import load_table

from ._oracles import OHLC_ORACLE as _OHLC_ORACLE



@register("ohlc_candles", _OHLC_ORACLE)
def q_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: hourly OHLCV candles per event_type over `events`.

    Reference semantics at /root/reference/main.py:150-170 with the
    O(1)-state struct-min/max open/close (SURVEY.md §4.3).
    """
    events = load_table(spark, sf_dir, "events")
    return ohlc_candles(
        events,
        ts_col="ts",
        symbol_col="event_type",
        price_col="value",
        qty_col=None,
        window_duration="1 hour",
        mode="efficient",
    )


@register("ohlc_candles_faithful", _OHLC_ORACLE)
def q_ohlc_candles_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own collect_list/array_sort open-close pipeline
    (/root/reference/main.py:153-158) — kept as a parity witness; same
    oracle as the efficient mode."""
    events = load_table(spark, sf_dir, "events")
    return ohlc_candles(
        events,
        ts_col="ts",
        symbol_col="event_type",
        price_col="value",
        qty_col=None,
        window_duration="1 hour",
        mode="faithful",
    )


def _wire_trades(events: DataFrame) -> DataFrame:
    """Synthesize the reference's Kafka wire format from the events table.

    Mirrors FIXTURES.md §A: all fields strings, timestamp as epoch seconds
    (1-second resolution — intra-second ties exercise the open/close
    tie-break). Every 7th row gets a non-matching topic to exercise the
    base-derivation fallback (main.py:131-136). quantity uses sixteenths so
    double sums are exact (dyadic rationals) on both engines.
    """
    return events.select(
        F.when(
            F.col("event_id") % 7 == 0, F.concat(F.lit("raw-"), F.col("event_type"))
        )
        .otherwise(
            F.concat(F.lit("parsed-trades-"), F.col("event_type"), F.lit("-usdt"))
        )
        .alias("topic"),
        F.to_json(
            F.struct(
                F.upper(F.col("event_type")).alias("from_symbol"),
                F.lit("usdt").alias("to_symbol"),
                F.col("ts").cast("timestamp").cast("long").cast("string").alias(
                    "timestamp"
                ),
                F.col("value").cast("string").alias("price"),
                ((F.col("event_id") % 10) / F.lit(16.0) + F.lit(1.0))
                .cast("string")
                .alias("quantity"),
            )
        ).alias("value"),
    )


_WIRE_TRADES_SQL = """
  SELECT
    CASE WHEN event_id % 7 = 0 THEN 'raw-' || event_type
         ELSE 'parsed-trades-' || event_type || '-usdt' END          AS topic,
    upper(event_type)                                                AS from_symbol,
    CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP) AS timestamp,
    value                                                            AS price,
    (event_id % 10) / 16.0 + 1.0                                     AS quantity
  FROM events
"""


@register(
    "trade_pipeline",
    f"""
WITH trades AS ({_WIRE_TRADES_SQL})
SELECT
  time_bucket(INTERVAL '15 minutes', timestamp)                       AS window_start,
  time_bucket(INTERVAL '15 minutes', timestamp) + INTERVAL '15 minutes' AS window_end,
  CASE WHEN regexp_matches(topic, 'parsed-trades-.+-usdt')
       THEN regexp_extract(topic, 'parsed-trades-([^-]+)-usdt', 1)
       ELSE from_symbol END                                           AS symbol,
  min(struct_pack(t := timestamp, p := price)).p                      AS open,
  max(price)                                                          AS high,
  min(price)                                                          AS low,
  max(struct_pack(t := timestamp, p := price)).p                      AS close,
  sum(quantity)                                                       AS volume,
  count(*)                                                            AS n_trades
FROM trades
GROUP BY 1, 2, 3
""",
)
def q_trade_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference pipeline: wire JSON → parse → cast → null-guard
    → base derivation → 15-minute OHLCV candles per base.

    This is /root/reference/main.py:102-170 as one batch query: the wire
    records round-trip through from_json exactly as Kafka values would.
    """
    events = load_table(spark, sf_dir, "events", parallelize=True)
    trades = trades_from_wire(_wire_trades(events))
    return ohlc_candles(
        trades,
        ts_col="timestamp",
        symbol_col="base",
        price_col="price",
        qty_col="quantity",
        window_duration="15 minutes",
        mode="efficient",
    )


@register(
    "derive_base",
    f"""
WITH trades AS ({_WIRE_TRADES_SQL})
SELECT
  topic,
  CASE WHEN regexp_matches(topic, 'parsed-trades-.+-usdt')
       THEN regexp_extract(topic, 'parsed-trades-([^-]+)-usdt', 1)
       ELSE from_symbol END AS base,
  count(*)                  AS n_rows
FROM trades
GROUP BY 1, 2
""",
)
def q_derive_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic→base derivation (P6): regex extraction with from_symbol
    fallback for non-matching topics (/root/reference/main.py:131-136)."""
    events = load_table(spark, sf_dir, "events", parallelize=True)
    trades = trades_from_wire(_wire_trades(events))
    return trades.groupBy("topic", "base").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "json_extract_props",
    """
SELECT
  event_type,
  CAST(SUM(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MAX(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS max_k,
  COUNT(*)                                           AS n_rows
FROM events
GROUP BY event_type
""",
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (P2 family): parse events.props and aggregate.

    get_json_object stays JVM-side; the parse is pruned to the single
    requested path (Catalyst OptimizeJsonExprs)."""
    events = load_table(spark, sf_dir, "events", parallelize=True)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "candle_serialize",
    """
SELECT
  'candles-' || event_type || '-usdt' AS topic,
  event_type                          AS key,
  '{"base":"' || event_type
    || '","start_ts":"' || strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
    || '","open":' || CAST(CAST(min(struct_pack(t := ts, p := value)).p AS DECIMAL(18,2)) AS VARCHAR)
    || ',"high":' || CAST(CAST(max(value) AS DECIMAL(18,2)) AS VARCHAR)
    || ',"low":'  || CAST(CAST(min(value) AS DECIMAL(18,2)) AS VARCHAR)
    || ',"close":' || CAST(CAST(max(struct_pack(t := ts, p := value)).p AS DECIMAL(18,2)) AS VARCHAR)
    || ',"volume":' || CAST(count(*) AS VARCHAR)
    || '}'                            AS value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
""",
)
def q_candle_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candle → Kafka sink row projection (P7+P8, main.py:173-188): per-row
    output topic, key = base, canonical JSON value.

    Canonical-string JSON (decimal-formatted numbers, second-resolution
    timestamps) rather than to_json, so the oracle can reproduce it
    byte-for-byte; the to_json variant is exercised in tests/."""
    events = load_table(spark, sf_dir, "events")
    candles = ohlc_candles(
        events, ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 hour",
    )
    d2s = lambda c: F.col(c).cast("decimal(18,2)").cast("string")  # noqa: E731
    return candles.select(
        F.concat(F.lit("candles-"), F.col("symbol"), F.lit("-usdt")).alias("topic"),
        F.col("symbol").alias("key"),
        F.concat(
            F.lit('{"base":"'), F.col("symbol"),
            F.lit('","start_ts":"'),
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"),
            F.lit('","open":'), d2s("open"),
            F.lit(',"high":'), d2s("high"),
            F.lit(',"low":'), d2s("low"),
            F.lit(',"close":'), d2s("close"),
            F.lit(',"volume":'), F.col("n_trades").cast("string"),
            F.lit("}"),
        ).alias("value"),
    )


_GAP_FILL_ORACLE = """
WITH candles AS (
  SELECT date_trunc('hour', ts) AS ws, event_type AS symbol,
         max(struct_pack(t := ts, p := value)).p AS close,
         count(*) AS n_trades
  FROM events GROUP BY 1, 2
), bounds AS (SELECT min(ws) AS mn, max(ws) AS mx FROM candles),
grid AS (
  SELECT s.symbol, g.ws
  FROM (SELECT DISTINCT symbol FROM candles) s
  CROSS JOIN (SELECT unnest(generate_series((SELECT mn FROM bounds),
                                            (SELECT mx FROM bounds),
                                            INTERVAL 1 HOUR)) AS ws) g
)
SELECT
  grid.symbol,
  grid.ws                                   AS window_start,
  COALESCE(c.n_trades, 0)                   AS n_trades,
  CAST(c.ws IS NULL AS BOOLEAN)             AS is_gap,
  last_value(c.close IGNORE NULLS)
    OVER (PARTITION BY grid.symbol ORDER BY grid.ws
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled
FROM grid LEFT JOIN candles c ON c.symbol = grid.symbol AND c.ws = grid.ws
"""


@register("candle_gap_fill", _GAP_FILL_ORACLE)
def q_candle_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a complete hourly grid per symbol (sequence +
    explode — no data skew, grid is symbols x hours), left-joined candles,
    gaps carry volume 0 and a forward-filled close (last non-null over an
    ordered frame). The resample/fill operator every OHLC consumer needs
    downstream of the reference's candles."""
    events = load_table(spark, sf_dir, "events")
    candles = ohlc_candles(
        events, ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 hour",
    ).select("symbol", F.col("window_start").alias("ws"), "close", "n_trades")
    bounds = candles.agg(
        F.min("ws").alias("mn"), F.max("ws").alias("mx")
    )
    grid = (
        candles.select("symbol").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "symbol",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("ws"),
        )
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("ws")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(
        candles.withColumnRenamed("ws", "c_ws").withColumnRenamed(
            "symbol", "c_symbol"
        ),
        (F.col("symbol") == F.col("c_symbol")) & (F.col("ws") == F.col("c_ws")),
        "left",
    )
    return joined.select(
        "symbol",
        F.col("ws").alias("window_start"),
        F.coalesce(F.col("n_trades"), F.lit(0)).alias("n_trades"),
        F.col("c_ws").isNull().alias("is_gap"),
        F.last("close", ignorenulls=True).over(w).alias("close_filled"),
    )


@register(
    "candle_trend_slope",
    """
WITH raw AS (
  SELECT event_type AS symbol,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) / 3600 AS x,
         max(struct_pack(t := ts, p := value)).p AS close
  FROM events GROUP BY 1, 2
), candles AS (
  SELECT symbol, x - min(x) OVER (PARTITION BY symbol) AS x, close FROM raw
), sums AS (
  SELECT symbol,
         count(*)                                            AS n,
         SUM(CAST(x AS DECIMAL(30,0)))                       AS sx,
         SUM(CAST(close AS DECIMAL(30,6)))                   AS sy,
         SUM(CAST(x AS DECIMAL(30,0)) * CAST(x AS DECIMAL(30,0)))      AS sxx,
         SUM(CAST(x AS DECIMAL(30,0)) * CAST(close AS DECIMAL(30,6)))  AS sxy
  FROM candles GROUP BY symbol
)
SELECT symbol, n,
       CAST(CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(20,6))
            - CAST(sx AS DECIMAL(15,0)) * CAST(sy AS DECIMAL(20,6)) AS DOUBLE)
         / CAST(CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(20,0))
            - CAST(sx AS DECIMAL(15,0)) * CAST(sx AS DECIMAL(15,0)) AS DOUBLE)
         AS slope
FROM sums
""",
)
def q_candle_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol OLS trend of hourly closes: slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²) with every sum in exact decimal (x is an integer hour
    index, close has fixed scale), so the only float op is the final
    division — bit-identical cross-engine, unlike the built-in
    regr_slope whose double accumulation is order-dependent. x is
    centered to the symbol's first hour so every decimal product fits
    precision 38 without rounding on either engine."""
    events = load_table(spark, sf_dir, "events")
    candles = ohlc_candles(
        events, ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 hour",
    ).select(
        "symbol",
        (F.col("window_start").cast("timestamp").cast("long") / 3600)
        .cast("long")
        .alias("x"),
        "close",
    )
    w_sym = Window.partitionBy("symbol")
    candles = candles.withColumn("x", F.col("x") - F.min("x").over(w_sym))
    xd = F.col("x").cast("decimal(30,0)")
    yd = F.col("close").cast("decimal(30,6)")
    sums = candles.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
    )
    # Just-enough precisions: every product stays within DECIMAL(38)
    # on BOTH engines (overflow would silently promote to double in
    # DuckDB and round under precision-loss rules in Spark).
    nd = F.col("n").cast("decimal(10,0)")
    sx = F.col("sx").cast("decimal(15,0)")
    sy = F.col("sy").cast("decimal(20,6)")
    sxx = F.col("sxx").cast("decimal(20,0)")
    sxy = F.col("sxy").cast("decimal(20,6)")
    return sums.select(
        "symbol",
        "n",
        (
            (nd * sxy - sx * sy).cast("double")
            / (nd * sxx - sx * sx).cast("double")
        ).alias("slope"),
    )


@register(
    "candle_minmax_norm",
    """
WITH candles AS (
  SELECT event_type AS symbol,
         date_trunc('hour', ts)                  AS window_start,
         max(struct_pack(t := ts, p := value)).p AS close
  FROM events GROUP BY 1, 2
), ext AS (
  SELECT symbol, min(close) AS lo, max(close) AS hi FROM candles GROUP BY symbol
)
SELECT c.symbol, c.window_start, c.close,
       (c.close - e.lo) / (e.hi - e.lo) AS close_norm
FROM candles c JOIN ext e ON c.symbol = e.symbol
""",
)
def q_candle_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map custom operator (applyInPandas): per-symbol min-max
    normalization of hourly closes computed inside an Arrow batch per
    group. Min/max are exact comparisons and the scaling is one IEEE
    division, so the pandas kernel is bit-identical to the oracle's
    relational form — the grouped-map path is value-hash-checked like
    everything else."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    candles = ohlc_candles(
        events, ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 hour",
    ).select("symbol", "window_start", "close")

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["close"].min(), pdf["close"].max()
        out = pdf.copy()
        out["close_norm"] = (pdf["close"] - lo) / (hi - lo)
        return out

    return candles.groupBy("symbol").applyInPandas(
        norm,
        schema="symbol string, window_start timestamp_ntz, close double, "
        "close_norm double",
    )


@register(
    "vwap_candles",
    """
WITH e AS (
  SELECT date_trunc('hour', ts) AS ws, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(props ->> 'k' AS BIGINT)      AS qty
  FROM events
  WHERE CAST(props ->> 'k' AS BIGINT) > 0
)
SELECT
  ws AS window_start,
  event_type AS symbol,
  CAST(CAST(SUM(cents * qty) AS BIGINT) AS DOUBLE) / 100.0 / SUM(qty) AS vwap,
  CAST(SUM(qty) AS BIGINT) AS total_qty,
  COUNT(*)                 AS n_events
FROM e
GROUP BY 1, 2
""",
)
def q_vwap_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (symbol, hour): the finance twin
    of ohlc_candles with props.k as quantity (zero-quantity ticks carry no
    volume — declared out). Prices are exact integer cents, so the
    weighted sum is a bit-stable integer under any partitioning; the two
    divisions run left-to-right in doubles on both engines. One shuffle
    (partial → final hash agg), JSON parse pruned to '$.k'."""
    events = load_table(spark, sf_dir, "events", parallelize=True)
    qty = F.get_json_object(F.col("props"), "$.k").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.select(
            F.date_trunc("hour", "ts").alias("window_start"),
            F.col("event_type").alias("symbol"),
            cents.alias("cents"),
            qty.alias("qty"),
        )
        .where(F.col("qty") > 0)
        .groupBy("window_start", "symbol")
        .agg(
            (
                F.sum(F.col("cents") * F.col("qty")).cast("double")
                / F.lit(100.0)
                / F.sum("qty")
            ).alias("vwap"),
            F.sum("qty").alias("total_qty"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "twap_candles",
    """
WITH e AS (
  SELECT event_type, value, event_id,
         date_trunc('hour', ts)  AS ws,
         epoch_us(ts)            AS tsu,
         epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS end_us
  FROM events
), w AS (
  SELECT event_type, ws, value,
         COALESCE(LEAD(tsu) OVER (PARTITION BY event_type, ws
                                  ORDER BY tsu, event_id), end_us) - tsu AS wt
  FROM e
)
SELECT
  ws AS window_start,
  event_type AS symbol,
  CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT) * wt) AS BIGINT) AS DOUBLE)
    / 100.0 / SUM(wt) AS twap,
  COUNT(*) AS n_events
FROM w
GROUP BY 1, 2
""",
)
def q_twap_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (symbol, hour): each observation is
    weighted by microseconds until the next observation in the window (the
    last one carries to the window end). The sort is one per-partition
    window pass keyed like the final aggregation, so the plan is
    sort → window → hash agg with a single shuffle; (ts, event_id)
    ordering makes same-timestamp ties deterministic on both engines.

    Exactness bound: the weights partition the hour, so Σwt ≤ 3.6e9 µs per
    group no matter how many events land in it, and Σ(cents·wt) ≤
    max_cents · 3.6e9 ≈ 2e14 ≪ 2⁶³ — the integer sum cannot overflow at
    any event rate."""
    events = load_table(spark, sf_dir, "events")
    ws = F.date_trunc("hour", "ts")
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    end_us = F.unix_micros(
        (ws + F.expr("INTERVAL 1 HOUR")).cast("timestamp")
    )
    w = Window.partitionBy("event_type", "_ws").orderBy("_tsu", "event_id")
    weighted = (
        events.select(
            "event_type", "value", "event_id",
            ws.alias("_ws"), tsu.alias("_tsu"), end_us.alias("_end"),
        )
        .withColumn(
            "_wt", F.coalesce(F.lead("_tsu").over(w), F.col("_end")) - F.col("_tsu")
        )
    )
    pv = F.round(F.col("value") * 100).cast("long") * F.col("_wt")
    return (
        weighted.groupBy(
            F.col("_ws").alias("window_start"),
            F.col("event_type").alias("symbol"),
        )
        .agg(
            (F.sum(pv).cast("double") / F.lit(100.0) / F.sum("_wt")).alias(
                "twap"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register("ohlc_rollup_candles", _OHLC_ORACLE)
def q_ohlc_rollup_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level candle rollup: 1-minute candles merged into hourly ones.
    Shares the DIRECT hourly aggregation's oracle — the hash match is the
    proof that OHLCV merges losslessly (operators.ohlc.ohlc_rollup), which
    is what makes pre-aggregated candle layers safe at scale."""
    from ..operators.ohlc import ohlc_rollup

    events = load_table(spark, sf_dir, "events")
    fine = ohlc_candles(
        events, ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 minute",
    )
    return ohlc_rollup(fine, coarse="1 hour")


@register(
    "candle_bollinger",
    """
WITH candles AS (
  SELECT event_type AS symbol,
         date_trunc('hour', ts) AS ws,
         CAST(round(max(struct_pack(t := ts, p := value)).p * 100) AS BIGINT)
           AS close_cents
  FROM events GROUP BY 1, 2
), m AS (
  SELECT symbol, ws, close_cents,
         COUNT(*)           OVER w AS n,
         CAST(SUM(close_cents) OVER w AS BIGINT)                 AS sx,
         CAST(SUM(close_cents * close_cents) OVER w AS BIGINT)   AS sxx
  FROM candles
  WINDOW w AS (PARTITION BY symbol ORDER BY ws
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT symbol, ws AS window_start,
  close_cents / 100.0 AS close,
  CAST(sx AS DOUBLE) / n / 100.0 AS mid,
  CAST(sx AS DOUBLE) / n / 100.0
    + 2.0 * sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n / 100.0 AS upper_band,
  CAST(sx AS DOUBLE) / n / 100.0
    - 2.0 * sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n / 100.0 AS lower_band,
  n AS n_window
FROM m
""",
)
def q_candle_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over hourly closes: trailing-24-candle mean ± 2σ.
    The window moments (Σx, Σx²) are EXACT integer cents, so the
    population variance n·Σx² − (Σx)² is bit-stable under any
    partitioning; sqrt and the divisions are the only float ops, applied
    in the same left-to-right order as the oracle. One shuffle on symbol,
    one sorted window pass — the same plan class as every analytic here."""
    events = load_table(spark, sf_dir, "events")
    candles = ohlc_candles(
        events, ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 hour",
    ).select(
        "symbol",
        F.col("window_start").alias("ws"),
        F.round(F.col("close") * 100).cast("long").alias("close_cents"),
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("ws")
        .rowsBetween(-23, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("close_cents").over(w)
    sxx = F.sum(F.col("close_cents") * F.col("close_cents")).over(w)
    mid = sx.cast("double") / n / F.lit(100.0)
    dev = (
        F.lit(2.0)
        * F.sqrt((n * sxx - sx * sx).cast("double"))
        / n
        / F.lit(100.0)
    )
    return candles.select(
        "symbol",
        F.col("ws").alias("window_start"),
        (F.col("close_cents") / F.lit(100.0)).alias("close"),
        mid.alias("mid"),
        (mid + dev).alias("upper_band"),
        (mid - dev).alias("lower_band"),
        n.alias("n_window"),
    )


@register("candles_incremental_update", _OHLC_ORACLE)
def q_candles_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental candle maintenance (the late-backfill path): the
    event stream splits into an already-ingested base (event_id % 7
    != 0) and a late-arriving delta; each side aggregates to MERGEABLE
    partial-candle state (open/close kept as (ts, price) extrema keys
    — operators.ohlc.ohlc_partial_candles) and the two states merge
    per (window, symbol). Sharing the flagship's full-recompute oracle
    makes the hash match the proof: incremental merge ≡ recompute,
    bit for bit — the property that lets a 100 TB candle store absorb
    a backfill by touching only the affected windows' states instead
    of rescanning history."""
    from ..operators.ohlc import ohlc_merge_partials, ohlc_partial_candles

    events = load_table(spark, sf_dir, "events")
    late = F.col("event_id") % 7 == 0

    def partials(df: DataFrame) -> DataFrame:
        return ohlc_partial_candles(
            df, ts_col="ts", symbol_col="event_type", price_col="value",
            qty_col=None, window_duration="1 hour",
        )

    base = partials(events.where(~late))
    delta = partials(events.where(late))
    return ohlc_merge_partials(base.unionByName(delta))


@register(
    "ohlc_rollup_daily",
    """
SELECT
  CAST(date_trunc('day', ts) AS TIMESTAMP)      AS window_start,
  CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY
                                                AS window_end,
  event_type                                    AS symbol,
  min(struct_pack(t := ts, p := value)).p       AS open,
  max(value)                                    AS high,
  min(value)                                    AS low,
  max(struct_pack(t := ts, p := value)).p       AS close,
  CAST(count(*) AS DOUBLE)                      AS volume,
  count(*)                                      AS n_trades
FROM events
GROUP BY 1, 2, 3
""",
)
def q_ohlc_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-level rollup chain: minute candles → hourly → daily, checked
    against the direct daily aggregation's oracle. The hash match proves
    OHLCV mergeability is TRANSITIVE — any pre-aggregation ladder
    (the continuous-aggregate hierarchy a 100 TB candle store keeps for
    dashboards at every zoom level) yields the same bits as aggregating
    raw events once at the coarsest width."""
    from ..operators.ohlc import ohlc_rollup

    events = load_table(spark, sf_dir, "events")
    fine = ohlc_candles(
        events, ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 minute",
    )
    hourly = ohlc_rollup(fine, coarse="1 hour")
    return ohlc_rollup(hourly, coarse="1 day")


@register(
    "variant_props_stats",
    """
SELECT
  event_type,
  COUNT(*) AS n_rows,
  CAST(MIN(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS min_k,
  CAST(SUM(CASE WHEN CAST(props ->> 'k' AS BIGINT) % 2 = 0
                THEN 1 ELSE 0 END) AS BIGINT)        AS n_even_k,
  CAST(SUM(CASE WHEN props ->> 'missing' IS NULL
                THEN 1 ELSE 0 END) AS BIGINT)        AS n_missing
FROM events
GROUP BY event_type
""",
)
def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    ``parse_json`` → binary variant encoding → ``variant_get`` typed
    path extraction (and a missing-path probe returning NULL, not an
    error). The engine-native semi-structured path next to
    json_extract_props' string-functions path: VARIANT parses once
    into a shredded binary form, so repeated typed accesses skip
    re-parsing — the layout a 100 TB telemetry table wants.

    Aggregates are exact integers, so the oracle (DuckDB's JSON
    operators over the same rows) hash-matches bit-for-bit."""
    events = load_table(spark, sf_dir, "events", parallelize=True)
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    missing = F.variant_get(v, "$.missing", "string")
    return events.select("event_type", k.alias("k"), missing.alias("m")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("k").alias("min_k"),
        F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_even_k"),
        F.sum(F.when(F.col("m").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
    )

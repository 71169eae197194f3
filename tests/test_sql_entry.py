"""SQL-string entry path: registered temp views + spark.sql produce the
same answers as the DataFrame builders (SURVEY §3.4 — SQL comes free once
tables are views)."""

from __future__ import annotations

from ohlc_spark_streaming_spark.operators.ohlc import ohlc_candles
from ohlc_spark_streaming_spark.sources.batch import load_table, register_views

from .conftest import SF_SMOKE

OHLC_SPARK_SQL = """
SELECT
  window.start                            AS window_start,
  window.end                              AS window_end,
  event_type                              AS symbol,
  min(named_struct('t', ts, 'p', value)).p AS open,
  max(value)                              AS high,
  min(value)                              AS low,
  max(named_struct('t', ts, 'p', value)).p AS close,
  CAST(count(*) AS DOUBLE)                AS volume,
  count(*)                                AS n_trades
FROM events
GROUP BY window(ts, '1 hour'), event_type
"""


def test_sql_entry_matches_dataframe(spark):
    register_views(spark, SF_SMOKE)
    via_sql = spark.sql(OHLC_SPARK_SQL)
    via_df = ohlc_candles(
        load_table(spark, SF_SMOKE, "events"),
        ts_col="ts",
        symbol_col="event_type",
        price_col="value",
        qty_col=None,
        window_duration="1 hour",
    )
    assert via_sql.columns == via_df.columns
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_views_cover_all_tables(spark):
    register_views(spark, SF_SMOKE)
    from ohlc_spark_streaming_spark.schemas import TABLE_NAMES

    for name in TABLE_NAMES:
        assert spark.table(name).count() >= 0

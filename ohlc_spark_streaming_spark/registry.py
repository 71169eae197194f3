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
* **Full-precision doubles** (PageRank contributions, embedding moments,
  chi-square cells) can't use the decimal cast — double→decimal ROUNDING
  is the one step engines disagree on (the decimal trick works elsewhere
  only because prices are exactly representable at the cast scale).
  They sum as QUANTIZED INTEGER UNITS instead: ``floor(x·10^s + 0.5)``
  is multiply/add/floor — bit-identical IEEE ops everywhere — and the
  unit sum is exact integer addition (bigint, or DECIMAL(38,0)
  accumulators at corpus scale). See operators/graph.py.
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
# verification forever. Policy: a small ANCHOR set persists every round;
# the remaining slots ROTATE over queries that have not yet produced a
# (green) driver CORRECTNESS row, until every oracle-backed query has one
# (tracked in ROTATION.md — regenerate with tools_rotation.py).
#
# Round-9 window (VERDICT r8 items 1+3): the backlog is ZERO (every
# query has a driver row as of r8), so the window is pure
# re-verification: `token_id_encode` first (its r8 row is red — the
# driver canonicalizer choked on the raw array column, fixed to a
# space-joined string this round), then ALL 42 r4-era rows (the oldest
# remaining driver rows), then a 6-slot r5-era tail that round-9
# additions take over as they land (streaming LSH near-dup, TWS
# timer/TTL exhibits) — additions ≤ tail keeps the backlog at zero.

#: Permanent window slots — the flagship reference-parity query (also
#: what __spark_entry__.entry() runs).
DRIVER_ANCHORS: tuple[str, ...] = (
    "ohlc_candles",
)

#: Round-9 rotation: token_id_encode (r8 red, fixed) + all 42 r4-era
#: re-checks + 6 tail slots, all six taken by round-9 additions
#: (streaming_dedup_minhash, streaming_session_timers, dedup_span_pow2,
#: streaming_dedup_then_candles, dedup_span_suffix, streaming_semi_join).
#:
#: ROUND-10 PREP (apply at the START of round 10, never mid-round):
#: backlog stays 0 — every query has a driver row. The oldest remaining
#: re-checks are the 49 r5-era rows (bm25_search, cdc_merge_orders,
#: scd2_user_state, join_asof_forward/nearest/bucketed,
#: similarity_ivf_topk, pyds_* pair, streaming r5 twins, text battery
#: ...); they fill the 49 rotation slots exactly, so round-10 additions
#: displace the LEAST-RISKY re-checks from the tail (keep the dedup pair
#: joins and as-of family in). Candidate round-10 operators: exact-ℓ
#: suffix LCP without retaining all rank tables (fixes the documented
#: 16 GiB 100x OOM — release levels progressively by materializing the
#: pair table per descent round), and a 100x timing for
#: streaming_dedup_minhash (needs a >590s chunk budget or fewer samples).
DRIVER_ROTATION: tuple[str, ...] = (
    # --- The round-8 red (driver canonicalizer fix): must re-check ---
    "token_id_encode",
    # --- Re-checks: ALL 42 r4-era rows (oldest remaining driver rows;
    # --- per the ROUND-9 PREP plan) ---
    # Reference parity / candles
    "candle_serialize",
    "derive_base",
    "trade_pipeline",
    "ohlc_candles_faithful",
    "ohlc_sliding_candles",
    "vwap_candles",
    # TPC-H tail
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q7_nation_trade",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_effect",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_overstocked_suppliers",
    "q22_dormant_customers",
    # Relational / analytics battery
    "rollup_lineitem",
    "scalar_functions",
    "window_rank_battery",
    "session_windows_user",
    # Sampling trio
    "sample_stratified",
    "sample_systematic",
    "sample_weighted",
    # Text battery
    "text_langid",
    "text_lm_coverage",
    "text_quality",
    "text_tfidf",
    "quality_filter",
    # Dedup / similarity / sketches
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_simhash",
    "embedding_near_dup",
    "similarity_topk",
    "cms_token_counts",
    "corpus_prep_pipeline",
    "rag_retrieve_chunks",
    # Streaming twins
    "streaming_session_windows",
    "streaming_sliding_candles",
    # --- Tail (6): oldest r5-era re-checks; SURRENDER these slots to
    # --- round-9 additions as they land (streaming LSH near-dup, TWS
    # --- timer/TTL exhibits) so the backlog stays at zero ---
    # round-9 addition: stateful LSH near-dup at ingest (took bm25_search's slot)
    "streaming_dedup_minhash",
    # round-9 addition: event-time-timer sessionization (took cdc_merge_orders' slot)
    "streaming_session_timers",
    # round-9 addition: pow2 longest-duplicated-span (took scd2_user_state's slot)
    "dedup_span_pow2",
    # round-9 addition: chained stateful dedup→candles (took join_asof_forward's slot)
    "streaming_dedup_then_candles",
    # round-9 addition: suffix-array exact span dedup (took similarity_ivf_topk's slot)
    "dedup_span_suffix",
    # round-9 addition: stream-stream left-semi join (took pyds_stream_tick_summary's slot)
    "streaming_semi_join",
)

DRIVER_WINDOW: tuple[str, ...] = (*DRIVER_ANCHORS, *DRIVER_ROTATION)

_maybe_curate()
assert list(QUERIES)[:50] == list(DRIVER_WINDOW) or not all(
    n in QUERIES for n in DRIVER_WINDOW
), "driver window not at the head of the registry"

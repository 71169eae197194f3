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
# POST-BACKLOG ROTATION POLICY (round 11, VERDICT r10 item 4): with all
# 254 queries driver-checked at least once, the window rotates
# OLDEST-GREEN-FIRST — each round re-checks the queries whose latest
# driver row is stalest (merge CORRECTNESS_r*.json, take max round per
# name, ascending), so no query's latest row ages past ~4 rounds at the
# current registry size (254 names / 49 rotating slots ≈ 5.2 rounds a
# full cycle; additions displace least-risky tail re-checks, which then
# lead the next round's cohort). tools_rotation.py prints the cohort.
#
# Round-11 window: the 9 r5-era rows that rolled over when round-10's
# nine additions took their slots, then the r6-era rows riskier-first,
# with round-11 additions taking tail slots as they land. The r6 rows
# left out (the 10 structurally simplest — above_avg_orders,
# agg_distinct_counts, date_functions, mode_order_priority,
# orderby_limit, price_histogram, stats_corr_qty_price, topk_per_group,
# unpivot_lineitem_measures, user_event_type_sets — plus those each
# addition displaced: cube_orders, funnel_view_purchase, funnel_timed)
# lead round 12's cohort.
#
# ROUND-12 PREP (apply at the START of round 12, never mid-round):
# oldest-green-first as above. The cohort: the 13 r6-era rows named in
# the previous paragraph, then the r7-era rows (the next-oldest band —
# tools_rotation.py / the merged CORRECTNESS_r*.json ledger lists them;
# ~49 of them fill the window). Round-12 additions displace the
# least-risky tail as usual.

#: Permanent window slots — the flagship reference-parity query (also
#: what __spark_entry__.entry() runs).
DRIVER_ANCHORS: tuple[str, ...] = (
    "ohlc_candles",
)

#: Round-10 rotation: all 49 r5-era re-checks (the oldest remaining
#: driver rows). Ordered family-by-family with the LEAST-RISKY names at
#: the tail — round-10 additions take tail slots as they land so the
#: backlog stays at zero.
#:
#: ROUND-11 PREP (apply at the START of round 11, never mid-round):
#: backlog stays 0. Round-10 ran TWO sessions and landed NINE
#: additions (boilerplate_span_catalog, dedup_span_cut_suffix,
#: streaming_anti_join, streaming_full_outer_join, similarity_pq_topk,
#: similarity_ivfpq_topk, decontaminate_span, decontaminate_cut,
#: streaming_decontaminate) — each took the least-risky re-check slot
#: at land time, so nine r5-era re-checks rolled over
#: (orderby_limit_offset, string_agg_statuses, text_normalize,
#: text_token_count, profile_documents, text_chunks,
#: multimodal_meta_entries, text_fingerprint, zorder_bucket_counts);
#: they join the r6-era cohort as the oldest remaining rows. Rotation = whatever tools_rotation.py lists at
#: round close; round-11 additions displace the least-risky tail as
#: usual. Remaining frontier candidates: event-time TTL exhibit if
#: Spark ever allows it (pinned ProcessingTime-only in r9), live Kafka
#: integration if a broker appears.
DRIVER_ROTATION: tuple[str, ...] = (
    # --- The 9 r5-era rows (oldest: rolled over when round-10's nine
    # --- additions took their slots) ---
    "multimodal_meta_entries",
    "orderby_limit_offset",
    "profile_documents",
    "string_agg_statuses",
    "text_chunks",
    "text_fingerprint",
    "text_normalize",
    "text_token_count",
    "zorder_bucket_counts",
    # --- 36 r6-era rows, riskier families first (the count shrinks by
    # --- one per round-11 addition below) ---
    # Streaming twins
    "streaming_asof_enrich",
    "streaming_candle_mad_outliers",
    "streaming_dedup_exact",
    "streaming_incremental_candles",
    "streaming_interarrival_stats",
    "streaming_session_funnel",
    # Dedup / embedding / sketch
    "dedup_containment",
    "dedup_cross_source",
    "dedup_hybrid_pairs",
    "minhash_recall_audit",
    "embedding_centroid_assign",
    "embedding_dim_variance",
    "embedding_quantize_int8",
    "approx_percentile_audit",
    "spatial_neighbor_pairs",
    # Graph / stats
    "bfs_distance_copurchase",
    "pagerank_copurchase",
    "stats_chi2_independence",
    "part_hierarchy_rollup",
    "cooc_lift_topk",
    "inverted_index_champions",
    "conjunctive_search",
    "doc_length_histogram",
    "udtf_token_positions",
    # Candles / windows
    "candles_incremental_update",
    "candle_bollinger",
    "candle_gap_fill",
    "candle_minmax_norm",
    "candle_trend_slope",
    "ohlc_rollup_candles",
    "ohlc_rollup_daily",
    "twap_candles",
    "window_candle_returns",
    "window_running_total",
    # Relational battery
    "q5_region_revenue",
    "error_streaks",
    # --- Tail: round-11 additions take these slots as they land ---
    # round-11 addition: oracle-checked recall@5 report for the trained
    # ANN index (took funnel_timed's slot — a timed two-step funnel,
    # green since r6)
    "ann_recall_report",
    # round-11 addition: fully incremental decontamination gate — eval
    # grams folded as a delta-maintained state table (took
    # funnel_view_purchase's slot — a two-step funnel, green since r6)
    "streaming_decontaminate_incr",
    # round-11 addition: corpus-wide boilerplate removal with the
    # rolling-hash scrub checksum (took cube_orders' slot — a grouping-
    # sets exhibit, green since r6)
    "boilerplate_cut",
    # round-11 addition: Lloyd-trained IVF-PQ with nprobe=2 (took
    # orderby_limit's slot — a one-line sort/limit, green since r6)
    "similarity_ivfpq_trained",
)

DRIVER_WINDOW: tuple[str, ...] = (*DRIVER_ANCHORS, *DRIVER_ROTATION)

_maybe_curate()
assert list(QUERIES)[:50] == list(DRIVER_WINDOW) or not all(
    n in QUERIES for n in DRIVER_WINDOW
), "driver window not at the head of the registry"

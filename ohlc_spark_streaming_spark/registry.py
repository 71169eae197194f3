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
# Round-10 window (VERDICT r9 item 3, per the written prep note): the
# backlog is ZERO and the oldest remaining driver rows are the 49
# r5-era re-checks — they fill the 49 rotation slots exactly. Round-10
# additions displace only the least-risky tail re-checks (short,
# structurally simple queries green since r5); the dedup pair joins
# and the as-of family stay in per the prep note.

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
    # --- Re-checks: ALL 49 r5-era rows (oldest remaining driver rows;
    # --- per the ROUND-10 PREP plan) ---
    # Reference parity / candles / Python DataSource
    "streaming_trade_pipeline",
    "pyds_tick_summary",
    "pyds_stream_tick_summary",
    "candles_gap_fill",
    "candle_mad_outliers",
    # TPC-H tail / relational battery
    "q12_priority_by_status",
    "skyline_orders",
    "latest_event_per_user",
    "cohort_retention",
    "funnel_conversion",
    "session_funnel",
    "interarrival_stats",
    "anomaly_zscore_events",
    "approx_distinct_parts",
    "basket_part_pairs",
    "fuzzy_match_parts",
    # round-10 addition: ingest-time decontamination gate (took
    # zorder_bucket_counts' slot — a file-stats bucketing audit, green
    # since r5)
    "streaming_decontaminate",
    "dq_expectations",
    "cdc_merge_orders",
    "scd2_user_state",
    # As-of join family (kept in per the prep note)
    "join_asof_forward",
    "join_asof_nearest",
    "join_asof_bucketed",
    # Dedup / similarity (pair joins kept in per the prep note)
    "dedup_jaccard_pairs",
    "dedup_span_windows",
    "similarity_ivf_topk",
    "similarity_topk_vectorized",
    "embeddings_stats",
    # Text / LLM battery
    "bm25_search",
    "lm_bigram_topk",
    # round-10 addition: exact cross-corpus decontamination spans (took
    # text_chunks' slot — fixed-width chunking, green since r5)
    "decontaminate_span",
    # round-10 addition: IVF-PQ composite ANN (took text_fingerprint's
    # slot — a scan-local rolling hash, green since r5)
    "similarity_ivfpq_topk",
    # round-10 addition: PQ-ADC ANN search (took profile_documents'
    # slot — a simple describe-style profile, green since r5; the
    # 4-slot tail was already surrendered to earlier r10 additions)
    "similarity_pq_topk",
    "quality_classifier_bucket",
    "split_drift_tvd",
    "split_leakage_audit",
    # Multimodal
    "multimodal_blob_stats",
    "multimodal_frame_sample",
    "multimodal_image_decode",
    # round-10 addition: cross-corpus decontamination cut (took
    # multimodal_meta_entries' slot — a map-entries explode, green
    # since r5)
    "decontaminate_cut",
    # Streaming twins
    "streaming_anomaly_zscore",
    "streaming_distinct_keys",
    "streaming_quality_filter",
    "streaming_stateful_error_counts",
    "streaming_static_join",
    # --- Tail (4): least-risky re-checks (short, structurally simple,
    # --- green since r5); SURRENDER these slots to round-10 additions
    # --- as they land so the backlog stays at zero ---
    # round-10 addition: stream-stream FULL OUTER interval join (took
    # orderby_limit_offset's slot — the last remaining tail re-check)
    "streaming_full_outer_join",
    # round-10 addition: corpus boilerplate catalog (took
    # string_agg_statuses' slot)
    "boilerplate_span_catalog",
    # round-10 addition: suffix-exact threshold span cut (took
    # text_normalize's slot)
    "dedup_span_cut_suffix",
    # round-10 addition: stream-stream left-anti interval join (took
    # text_token_count's slot)
    "streaming_anti_join",
)

DRIVER_WINDOW: tuple[str, ...] = (*DRIVER_ANCHORS, *DRIVER_ROTATION)

_maybe_curate()
assert list(QUERIES)[:50] == list(DRIVER_WINDOW) or not all(
    n in QUERIES for n in DRIVER_WINDOW
), "driver window not at the head of the registry"

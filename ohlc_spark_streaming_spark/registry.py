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
# Round-8 window (VERDICT r7 item 1): ALL 23 never-checked names (the
# round-7 additions, ROTATION.md "Remaining") get first-time slots —
# cumulative 234/234 after this round, zero backlog for the first time
# since round 4 — and the spare slots continue the re-verification
# program with the oldest remaining green rows (all 15 r3-era names,
# then the riskiest r4-era ones: dedup pair joins, as-of, reference
# parity, streaming OHLC). New round-8 queries take slots from the
# re-check TAIL as they land, so the backlog stays at zero.

#: Permanent window slots — the flagship reference-parity query (also
#: what __spark_entry__.entry() runs).
DRIVER_ANCHORS: tuple[str, ...] = (
    "ohlc_candles",
)

#: Round-8 rotation: the entire 23-name unchecked backlog (every
#: round-7 addition) + 26 oldest re-checks. Round-8 additions (the
#: transformWithStateInPandas twins, streaming_rolling_active) take
#: slots from the re-check tail as they land.
#:
#: ROUND-9 PREP (apply at the START of round 9, never mid-round): after
#: this round EVERY registered query has a driver row — zero backlog.
#: All 49 rotation slots are free: spend them on the oldest remaining
#: re-checks (the r4-era names not re-covered this round —
#: `derive_base`, `q1_pricing_summary`, `similarity_topk`,
#: `ohlc_sliding_candles`, `candle_serialize`, the TPC-H q4-q22 tail,
#: sampling trio, text battery — then r5-era), and swap round-9
#: additions into the tail as they land (capacity ≈ all 49 if needed;
#: keep additions ≤ the tail so the backlog stays zero). Candidate
#: round-9 operator: STREAMING MinHash-LSH near-dup at the door
#: (stateful band buckets keyed by (band_idx, band_hash) emitting
#: candidate pairs; bounded replay ⇒ the batch candidate set, so
#: dedup_minhash_lsh's oracle shares verbatim) — requires replicating
#: the identical-set collapse INSIDE the bucket state or the 10x
#: duplication sweep goes k-squared; design before coding.
DRIVER_ROTATION: tuple[str, ...] = (
    # --- First-time names (23): the complete round-7 tranche ---
    # Feature-engineering / training prep
    "equidepth_bin_apply",
    "winsorize_clip",
    "target_encode_smoothed",
    "group_split_users",
    "token_id_encode",
    "length_bucket_batches",
    "source_interleave_order",
    "contrastive_pairs",
    # Sharding / quotas
    "shard_checksum_manifest",
    "quota_apportion",
    # Dedup / sketch audits
    "simhash_recall_audit",
    "bloom_prune_audit",
    "dedup_span_cut",
    "corpus_curation_report",
    # Embedding / clustering
    "kmeans_update_step",
    # Temporal joins / snapshots
    "pit_feature_join",
    "snapshot_diff_orders",
    "join_cardinality_audit",
    "join_skew_audit",
    # Event analytics (the two perf-watch entries get their first
    # correctness rows this round too)
    "attribution_position",
    "anomaly_seasonal_baseline",
    "rolling_active_7d",
    "ewma_candles",
    # --- Re-checks (26): oldest remaining driver rows ---
    # r3-era rows (all 15 remaining)
    "dataset_split",
    "domain_mixture",
    "grouping_sets_orders",
    "json_extract_props",
    "percentiles_quantity",
    "price_histogram_equidepth",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "set_ops_order_status",
    "text_sentiment",
    "vocab_top_tokens",
    # r4-era rows (11 riskiest: dedup pair joins, as-of, reference
    # parity, streaming OHLC; tail slots are surrendered to round-8
    # additions as they land)
    "dedup_jaccard_ppjoin",
    "dedup_minhash_lsh",
    "dedup_clusters_star",
    "join_asof_purchase_view",
    "join_semi_anti",
    "streaming_ohlc_candles",
    # --- Round-8 additions (first-time slots, taken from the re-check
    # --- tail as they landed): transformWithStateInPandas twins, the
    # --- incremental rolling-DAU view, the streaming vocabulary monitor
    "streaming_error_counts_tws",
    "streaming_interarrival_stats_tws",
    "streaming_transition_counts_tws",
    "streaming_rolling_active",
    "streaming_vocab_topk",
)

DRIVER_WINDOW: tuple[str, ...] = (*DRIVER_ANCHORS, *DRIVER_ROTATION)

_maybe_curate()
assert list(QUERIES)[:50] == list(DRIVER_WINDOW) or not all(
    n in QUERIES for n in DRIVER_WINDOW
), "driver window not at the head of the registry"

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
# Round-13 window (applied at round-13 open per the r12 prep note):
# oldest-green-first over the merged r1–r12 ledger — the 3 r6-era rows
# round-12 additions displaced (date_functions, mode_order_priority,
# orderby_limit), the 18 r7-era rows (13 deferred at r12 open + the 5
# the r12 additions displaced), then 28 of the 48 r8-era rows
# riskier-families-first. The 20 r8 rows left out (the structurally
# simplest — relational/TPC-H audits:
# bloom_prune_audit, equidepth_bin_apply, ewma_candles,
# grouping_sets_orders, join_cardinality_audit, join_semi_anti,
# join_skew_audit, json_extract_props, percentiles_quantity,
# price_histogram_equidepth, q13_order_count_distribution,
# q15_top_supplier, q18_large_volume_customers, q21_waiting_suppliers,
# q2_min_cost_supplier, q6_forecast_revenue, rolling_active_7d,
# set_ops_order_status, snapshot_diff_orders, winsorize_clip — plus
# whatever each round-13 addition displaces from the tail) lead
# round 14's cohort.
#
# ROUND-14 PREP (apply at the START of round 14, never mid-round):
# oldest-green-first as above. The cohort: the 20 deferred r8-era rows
# named in the previous paragraph, the tail names round-13 additions
# displaced, then the r9-era band (tools_rotation.py / the merged
# CORRECTNESS_r*.json ledger lists them). Round-14 additions displace
# the least-risky tail as usual.

#: Permanent window slots — the flagship reference-parity query (also
#: what __spark_entry__.entry() runs).
DRIVER_ANCHORS: tuple[str, ...] = (
    "ohlc_candles",
)

#: Round-13 rotation: oldest-green-first per the post-backlog policy —
#: the 3 r6-era rows round-12 additions displaced, the 18 r7-era rows
#: (13 deferred at r12 open + 5 displaced by r12 additions), then 28 of
#: the 48 r8-era rows, riskier families first with the LEAST-RISKY
#: names at the tail so round-13 additions can take tail slots as they
#: land (displaced names lead round 14's cohort alongside the 20
#: deferred r8 rows). Remaining frontier candidates: event-time TTL
#: exhibit if Spark ever allows it (pinned ProcessingTime-only in r9),
#: live Kafka integration if a broker appears.
DRIVER_ROTATION: tuple[str, ...] = (
    # --- The 3 r6-era rows (oldest: displaced by round-12 additions) ---
    "date_functions",
    "mode_order_priority",
    "orderby_limit",
    # --- The 18 r7-era rows (13 deferred at r12 open + 5 displaced) ---
    "compaction_plan",
    "ship_interval_coverage",
    "join_range_shipdelay",
    "join_interval_overlap",
    "join_full_outer",
    "above_p90_lineitems",
    "array_functions",
    "daily_active_cumulative",
    "join_null_safe",
    "json_roundtrip_lines",
    "map_functions_battery",
    "null_semantics",
    "pivot_linestatus",
    "revenue_growth_mom",
    "variant_props_stats",
    "window_trailing_range",
    "window_value_functions",
    "zonemap_prune_audit",
    # --- 28 r8-era rows, riskier families first ---
    # Streaming twins (transformWithState battery + reference parity)
    "streaming_error_counts_tws",
    "streaming_interarrival_stats_tws",
    "streaming_ohlc_candles",
    "streaming_rolling_active",
    "streaming_transition_counts_tws",
    "streaming_vocab_topk",
    # Dedup / similarity / clustering
    "dedup_clusters_star",
    "dedup_jaccard_ppjoin",
    "dedup_minhash_lsh",
    "dedup_span_cut",
    "simhash_recall_audit",
    "kmeans_update_step",
    # Analytics / temporal joins
    "anomaly_seasonal_baseline",
    "attribution_position",
    "join_asof_purchase_view",
    "pit_feature_join",
    # LLM pipeline (least-risky tail — round-13 additions displace
    # from the BOTTOM as they land; displaced names lead round 14)
    "corpus_curation_report",
    # round-13 addition: streaming BPE encode — the frozen merge
    # table serving a document stream per micro-batch, finals ≡ the
    # batch encode (took contrastive_pairs' slot; it leads round 14)
    "streaming_bpe_encode",
    # round-13 addition: FILTERED ANN search — per-query label
    # predicate applied to the inverted-list scan BEFORE the ADC
    # top-k (FAISS IDSelector pre-filtering; took domain_mixture's
    # slot; it leads round 14's cohort)
    "ann_search_filtered",
    "group_split_users",
    # round-13 addition: refined streaming ANN serving — the frozen
    # serving tier with the IndexRefineFlat exact re-rank, finals ≡
    # the batch refined search (took quota_apportion's slot; it leads
    # round 14's cohort)
    "streaming_ann_serve_refine",
    # round-13 addition: BPE encode — the trained merge table applied
    # to the vocabulary, lossless segmentation under the driver hash
    # (took shard_checksum_manifest's slot; it leads round 14)
    "bpe_encode_vocab",
    # round-13 addition: multi-iteration BPE trainer (VERDICT r12
    # item 5 — took source_interleave_order's slot; it leads round 14)
    "bpe_train_merges",
    # round-13 addition: index-append compaction — lakehouse OPTIMIZE
    # for the ANN index, search served from the physically rewritten
    # layout, hash match = read-equivalence proof (VERDICT r12 item 7
    # — took target_encode_smoothed's slot; it leads round 14)
    "ann_index_compact",
    # round-13 addition: coarse quantizer trained from k-means‖ seeds
    # (Bahmani et al.; VERDICT r12 item 3 — took length_bucket_batches'
    # slot; it leads round 14's cohort)
    "lloyd_train_kmeanspar",
    # round-13 addition: the seeding lift as four driver-hashed
    # distortions (first-k vs k-means‖ × 0/2 Lloyd iterations — took
    # dataset_split's slot; it leads round 14's cohort)
    "kmeanspar_distortion_audit",
    # round-13 addition: ADC-shortlist + exact re-rank (FAISS
    # IndexRefineFlat; VERDICT r12 item 2 — took text_sentiment's
    # slot, a lexicon scorer, least-risky; it leads round 14's cohort)
    "similarity_ivfpq_refine",
    # round-13 addition: driver-checked recall@5 of the refined search
    # (the refine-vs-residual lift as a pair of hash-checked results:
    # 0.72 vs 0.34 at sf0.01 — took vocab_top_tokens' slot)
    "ann_recall_refine",
)

DRIVER_WINDOW: tuple[str, ...] = (*DRIVER_ANCHORS, *DRIVER_ROTATION)

_maybe_curate()
assert list(QUERIES)[:50] == list(DRIVER_WINDOW) or not all(
    n in QUERIES for n in DRIVER_WINDOW
), "driver window not at the head of the registry"

"""Regenerate PLANS.md: formatted physical plans of representative queries.

Run: ``python tools_make_plans.py`` (writes PLANS.md at the repo root).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ohlc_spark_streaming_spark import build_session  # noqa: E402
from ohlc_spark_streaming_spark.registry import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

NOTES = {
    "dedup_span_suffix": (
        "Distributed suffix array in Catalyst: one row per TOKEN through "
        "ceil(log2 max_doc_len) prefix-doubling rounds, each one "
        "equi-join (r_d at pos+d, -1 past end) + one global dense rank + "
        "a localCheckpoint — the checkpoint is MANDATORY, each round "
        "reads its predecessor twice so an unchecked logical plan "
        "doubles per round (observed optimizer OOM at 9 rounds). The "
        "global rank is size-adaptive: below 5M tokens a single-"
        "partition window (one task beats a range shuffle's per-round "
        "scheduling cost ~5x: 48s -> 8.3s at sf0.1); above, "
        "repartitionByRange + per-partition dense_rank + broadcast "
        "distinct-count offsets — no single-partition funnel at cluster "
        "scale, path equality pinned in tests. LCP descent is 2 hash "
        "joins per level over the adjacent-pair table; per-doc rollup "
        "is two aggregations. The brute oracle is O(sum len^2) grams — "
        "fine at sf0.01, and deliberately independent of the SA "
        "machinery it checks. Round 10 removed the 100x memory cliff: "
        "above the 5M-token threshold every intermediate is DISK_ONLY-"
        "checkpointed with tracked block ids and released progressively "
        "(each rank table the moment its descent level materializes, "
        "each pairs level when its successor lands), so peak footprint "
        "is O(tokens) on disk + one level in flight — 27M tokens now "
        "runs in ~400s on the same 16 GiB JVM that used to OOM; below "
        "the threshold the descent stays one lazy plan (the per-level "
        "round-trips would double smoke-scale wall-time) with a bulk "
        "release once the pair frame lands."
    ),
    "dedup_span_cut_suffix": (
        "Exact-threshold span cut on the suffix-array primitive: "
        "suffix_position_best emits (doc, pos, best) = longest "
        "duplicated span STARTING at each token, qualifying positions "
        "become closed intervals [p, p+best-1], the doc-keyed "
        "interval-union island sweep merges them (same operator as "
        "dedup_span_extents, no single-partition window), and the cut "
        "is an in-row higher-order filter over the O(spans) per-doc "
        "array — one extra shuffle past the suffix machinery. Any "
        "threshold (here 20 tokens) at the same O(tokens log L): the "
        "window ladder would pay K-gram rows per threshold and caps at "
        "its 8-token resolution. The md5 scrub proof byte-checks the "
        "kept text against the brute-gram oracle end-to-end."
    ),
    "streaming_anti_join": (
        "Stream-stream LEFT ANTI interval join composed from the "
        "left-outer state machine + right probe column + null filter "
        "(Spark has no native streaming anti — pinned by a test): every "
        "emission carries the watermark proof that no in-band match can "
        "still arrive, state stays O(rate x (lookback + watermark)). "
        "Two replay hazards pinned while building it: (1) eviction runs "
        "with the PREVIOUS batch's watermark, so a bounded tape needs "
        "TWO trailing sentinel files — with one, the final watermark "
        "exists but no batch ever evicts with it; (2) Catalyst pushes "
        "left-column predicates through the equi-join key into BOTH "
        "scans, so a user_id guard filtered the sentinels out AT THE "
        "SOURCE and starved the watermark — the sentinels carry a "
        "positive non-existent user id and the guard runs batch-side on "
        "the result table."
    ),
    "streaming_session_timers": (
        "The timer half of transformWithState (timeMode=EventTime): state "
        "is ONE open-session struct + ONE registered timer per user; "
        "sessions with a successor close at input time (their timer may "
        "trail the watermark), final sessions close when the watermark "
        "passes last+gap and the timer fires in the availableNow drain "
        "batch. Append-mode and final emissions — no complete-mode "
        "re-emission of the whole result per batch, which is what makes "
        "this the 100 TB session shape next to the built-in "
        "session_window twin that must run complete. Micro-unit integer "
        "sums keep the decimal-sum oracle bitwise. The tape's sentinel "
        "row (max ts + gap + delay) is the production punctuation/"
        "heartbeat pattern that closes event-time state on bounded "
        "replays; files are mtime-stamped in time order because the file "
        "source replays by mtime and an out-of-order slab would be late "
        "beyond the watermark and silently dropped."
    ),
    "streaming_dedup_minhash": (
        "Dedup at the door: the per-document hashing (tokens -> rolling "
        "hashes -> shingle set -> fingerprint -> MinHash -> band keys) is "
        "one NARROW in-row projection (shingle_units_expr) because nothing "
        "may aggregate upstream of a stateful operator — zero shuffles "
        "before the state exchange on (band, key). Bucket state is a typed "
        "MapState[fp -> marker]: a new distinct content pairs against the "
        "bucket's known fingerprints; an identical copy is a membership "
        "hit — zero state growth, zero emissions — which replicates the "
        "batch identical-set collapse INSIDE state and keeps k-fold "
        "duplicated corpora from emitting k-squared bucket pairs. The "
        "emission log is the collapsed candidate set (bounded by distinct "
        "content x band cohabitation); exact-Jaccard verification and "
        "group expansion run batch-side on equi-joins against the group "
        "table. At 100 TB the finalize joins the checkpointed group table "
        "the ingest pipeline maintains anyway; state per bucket stays "
        "small by LSH construction (that is what makes LSH subquadratic)."
    ),
    "decontaminate_span": (
        "Exact cross-corpus contamination on the shared suffix-array "
        "core: one SA over the UNION of train+eval corpora (same "
        "prefix-doubling rounds as dedup_span_suffix, now carrying the "
        "SA index), then the cross answer is NOT an all-pairs probe — "
        "a train suffix's longest match into the eval set is attained "
        "at the NEAREST eval suffix in SA order on either side (pair "
        "LCP = range-min of adjacent LCPs, so passing the nearest eval "
        "suffix only shrinks the min). One prefix count of eval "
        "suffixes (size-adaptive: global window below the 5M-token "
        "threshold, range-partitioned running sums + broadcast offsets "
        "above) splits the SA into (eval head, following train run) "
        "partitions; two partitioned window passes (asc masked-head "
        "min, desc strict-preceding min) give every train position its "
        "exact eval-shared span. Hazard pinned while building: the "
        "window columns must materialize ABOVE the eval-row filter — "
        "a pre-window filter deletes the partition-head eval rows and "
        "silently shifts every best (caught by the tiny-corpus brute "
        "check, now a hypothesis property test)."
    ),
    "decontaminate_cut": (
        "The action decontaminate_span scores: qualifying train "
        "positions (eval-shared best >= 6) become closed intervals, "
        "the doc-keyed interval-union island sweep merges them, and "
        "the cut is the same in-row higher-order filter as "
        "dedup_span_cut_suffix with the same md5 scrub proof — one "
        "extra shuffle past the shared SA machinery. Eval docs flow "
        "through neither side; train-train duplication is (correctly) "
        "not contamination and survives, pinned by a planted test."
    ),
    "similarity_pq_topk": (
        "PQ-ADC search (Jegou et al.): the corpus is 8 small codes per "
        "vector (the codebook assignment embedding_pq_audit audits) "
        "and each query ranks the WHOLE corpus by summing 8 lookup-"
        "table entries — one equi-join of the code table against a "
        "queries x 64-entry broadcast LUT + one partial-aggregated "
        "sum, never a 64-dim fold per pair. At 100 TB this is the "
        "point of PQ: the ranking scan reads ~3% of the bytes (codes, "
        "not vectors), the LUT is KB-sized, and the join/agg shape is "
        "embarrassingly partial. Per-entry integer-unit quantization "
        "(floor(d*1e9+0.5)) makes the 8-way sum exact integer math — "
        "shuffle-order-independent where a double sum would drift in "
        "the last ulp between engines."
    ),
    "streaming_full_outer_join": (
        "Native fullOuter stream-stream interval join — the last "
        "family member (inner/left-outer/semi/anti/full): matched "
        "pairs emit immediately; each side's unmatched rows emit once "
        "the OTHER side's watermark proves no in-band partner can "
        "arrive (the band bounds both directions, so both state stores "
        "stay O(rate x (lookback + delay))). The bounded replay reuses "
        "the anti join's closed-tape discipline verbatim: two trailing "
        "sentinel files flowing through BOTH side filters, guard "
        "batch-side (scan pushdown would starve the watermark). "
        "Unlike the inner/semi shapes the right key cannot be dropped "
        "— right-unmatched rows have a NULL left key, so the output "
        "key is coalesce(l.key, r.key)."
    ),
    "similarity_ivfpq_topk": (
        "IVF-PQ composite (FAISS IVFADC shape): the coarse half prunes "
        "CANDIDATES (only the query's cell's inverted list is read, "
        "nprobe=1, the shared _coarse_cells struct-min assignment) and "
        "the fine half compresses them (the SHARED _pq_codes_lut codes "
        "+ LUT; ADC = one (cell, s, c) equi-join against the broadcast "
        "LUT + one partial-aggregated integer-unit sum). At 100 TB the "
        "two multiply: ~1/n_cells of the corpus scanned at ~3% of the "
        "bytes. Composition is exact by construction — the composite "
        "equals full-corpus ADC filtered to the probed cell, pinned in "
        "tests/test_ann_recall.py — so the plan adds exactly one join "
        "key (cell) over similarity_pq_topk, no second ranking path."
    ),
    "similarity_ivfpq_residual": (
        "Residual-encoded trained IVF-PQ (FAISS IVFADC's default): PQ "
        "codes quantize v − centroid(cell(v)) instead of the raw "
        "vector, and the query's ADC LUT is built per (query, probed "
        "cell) from its cell-dependent residual — the only plan delta "
        "vs the trained-raw composite is one extra broadcast join "
        "(assigned centroid → residual, an in-row zip_with subtract) "
        "on each side and 'cell' joining the LUT instead of tagging "
        "it. Training costs iters=3 coarse + iters=3 subspace Lloyd "
        "rounds (measured choice: recall@5 0.34 vs 0.24 at iters=2 — "
        "residuals are only worth fitting once the coarse quantizer "
        "settles), each one narrow scan + (key, dim) partial agg with "
        "O(k·dim) driver state; search still reads ~nprobe/n_cells of "
        "the corpus at ~3% of the bytes."
    ),
    "ann_index_append_audit": (
        "The ANN index lifecycle's delta path: train on the base slice "
        "(vec_id % 10 < 8), then encode_into_index assigns + residual-"
        "encodes the remaining 20% against the FROZEN centroids/"
        "codebooks — one broadcast-assign + one in-row encode over the "
        "delta, zero retraining (the dedup_incremental_probe shape "
        "applied to retrieval: at 100 TB the index trains offline and "
        "the corpus grows by appends). Search runs over the grown "
        "tables; append ≡ rebuild-encode row-for-row because "
        "assignment/encoding are deterministic functions of the frozen "
        "tables (two-phase pin in tests/test_round12_ops.py), which is "
        "also why the oracle can replay it as base-trained training + "
        "full-corpus frozen encode."
    ),
    "dedup_semantic_cells": (
        "SemDeDup: the Lloyd-trained ANN coarse quantizer reused as the "
        "dedup blocker — within-cell cosine pairs only, never "
        "all-pairs, with identical vectors collapsed to one "
        "representative per (cell, vector) BEFORE the pair join (the "
        "_set_groups discipline, so k copies cost one cosine, not k²; "
        "duplication-invariance pinned in tests/test_round12_ops.py "
        "against a pure-Python brute force). Survivorship is the "
        "deterministic greedy rule — dropped iff a lower-id same-cell "
        "vector clears the threshold — so clustering AND verdicts sit "
        "under the value hash. At 100 TB, cell count scales with the "
        "corpus (k ~ sqrt(N)) keeping per-cell pair spaces bounded."
    ),
    "streaming_ann_serve": (
        "The serving tier: train once (batch), freeze the four index "
        "tables (cells/codes eagerly DISK_ONLY-checkpointed so training "
        "never re-runs per micro-batch; centroids/codebook are already "
        "k·dim driver literals), answer each micro-batch of query "
        "vectors with the batch search operator — stream-static with "
        "every broadcast side schema-constant. Queries are independent "
        "rows arriving in exactly one batch and ranked against the "
        "full static corpus, so per-batch finals ARE the global "
        "answer; the three-batch tape test pins finals ≡ batch trained "
        "top-k, and the oracle is similarity_ivfpq_residual's "
        "verbatim. Finals accumulate driver-side, ≤ k rows per query."
    ),
    "streaming_bpe_encode": (
        "Frozen-tokenizer serving (the BPE twin of streaming_ann_serve): "
        "train the merge table once offline (bpe_train_rules), freeze "
        "it, segment each micro-batch's distinct words with n_merges "
        "chained greedy codegen folds (map-only, zero shuffles), and "
        "merge per-batch (word, freq) partials into the vocabulary "
        "ledger at drain. Segmentation is a pure function of (word, "
        "rules), so finals ≡ the batch bpe_encode_vocab answer — "
        "arrival-batching invariance pinned by the three-batch tape "
        "pytest. Cross-batch state is word-keyed: bounded by "
        "vocabulary, not corpus."
    ),
    "ann_search_filtered": (
        "Filtered ANN search (FAISS IDSelector / per-tenant vector "
        "search): each probe query asks for neighbors within its own "
        "label class, and the predicate prunes candidates on the "
        "inverted-list scan BEFORE the ADC top-k (pre-filtering), so "
        "all k slots satisfy the filter — post-filtering an unfiltered "
        "top-k under-fills, the classic filtered-ANN mistake (pinned "
        "in tests/test_round13_ops.py). The label rides the codes "
        "relation as a co-located vec_id join (at 100 TB it is stored "
        "alongside the codes at index-build time); the per-query "
        "requested value rides the broadcast LUT; candidate pruning "
        "happens before any per-candidate arithmetic."
    ),
    "similarity_ivfpq_refine": (
        "ADC shortlist + exact re-rank (FAISS IndexRefineFlat): the "
        "residual trained index retrieves the top refine_factor·k "
        "candidates by approximate ADC distance, then exact squared-L2 "
        "on ONLY those candidates' raw vectors re-ranks the shortlist "
        "(1e-9 integer units — deterministic, oracle-replayable). The "
        "shortlist is n_queries·refine_factor·k rows — broadcast onto "
        "the corpus scan, so the raw-vector fetch never shuffles the "
        "corpus; at 100 TB it is a few hundred column-pruned point "
        "reads. Recall@5 0.34 → 0.72 at sf0.01 (driver-checked pair "
        "ann_recall_refine / ann_recall_residual); the streaming twin "
        "streaming_ann_serve_refine serves the same re-rank per "
        "micro-batch against the frozen index, finals ≡ this batch "
        "search."
    ),
    "ann_index_staleness": (
        "The retrain-scheduling signal: recall@5 of the FROZEN "
        "base-trained index serving the append-grown corpus "
        "(ann_index_append_audit's exact serving state) against the "
        "exact squared-L2 yardstick over that corpus. Read next to "
        "ann_recall_residual (the retrained index on the same corpus: "
        "0.34) the per-query delta IS the staleness cost (stale: 0.22 "
        "at sf0.001) — two independently driver-hash-checked results, "
        "the residual-vs-raw lift pattern. Plan = the append-audit "
        "chain + the shared _recall_vs_exact tail (one definition on "
        "both engines: Spark helper mirrors the oracle's _recall_tail)."
    ),
    "ann_recall_report": (
        "Retrieval quality under the value-hash gate: per probe query, "
        "the overlap between the exact squared-L2 top-5 and what the "
        "TRAINED IVF-PQ index returns — recall@5 promoted from a "
        "pytest pin to a driver-checked result. The oracle replays the "
        "trained index via the SAME CTE chain as "
        "similarity_ivfpq_trained (one definition, so the yardstick "
        "audits the index it ships with) plus a brute-force exact "
        "half bounded by the 10-query probe set. A drift anywhere in "
        "training, probing, or ADC ranking surfaces as a recall value "
        "mismatch even when the top-k rows still look plausible."
    ),
    "streaming_decontaminate_incr": (
        "Both decontamination corpora incremental: the eval stream "
        "folds into a persisted distinct-gram table with the "
        "dedup_incremental_probe delta shape — each batch's grams LEFT "
        "ANTI probe the state and only FRESH grams append, DISK_ONLY "
        "checkpoint per snapshot with the superseded blocks released — "
        "so refreshing the gate after a benchmark-suite append "
        "re-hashes only the delta, never the accumulated eval corpus. "
        "The train side replays fold_decontaminate verbatim (shared "
        "gate, one definition). n_eval_grams puts the state table's "
        "size under the oracle hash; the two-phase tape test proves "
        "append-then-gate equals the from-scratch batch rebuild."
    ),
    "boilerplate_cut": (
        "The catalog's implied curator action: the SAME fully "
        "tie-broken top-20 phrase CTE (count desc, phrase asc), its 20 "
        "phrases broadcast against the positional gram stream to "
        "become closed spans, the dedup_span_cut_suffix in-row "
        "higher-order filter for the cut, and a per-source ledger "
        "whose scrub proof is the shard_checksum_manifest discipline — "
        "commutative sum + xor of one cross-engine rolling hash of "
        "doc_id:kept_text per doc, O(1) aggregate state where a "
        "sorted-md5 digest would buffer every doc id per source. "
        "Planted-phrase test recomputes the checksums from expected "
        "kept text byte-for-byte (tests/test_round11_ops.py)."
    ),
    "similarity_ivfpq_trained": (
        "The quality frontier closed (VERDICT r10 item 1): both "
        "quantizers are Lloyd-TRAINED — two fixed k-means iterations "
        "from the training-free seeds, each iteration one narrow "
        "scan + one (cell, dim)-keyed partial aggregate with O(k*dim) "
        "collected driver state (how a production trainer runs; "
        "centroid means sum exact 1e-12 integer units so training is "
        "bitwise cross-engine) — and the query probes its 2 nearest "
        "cells. Lifts recall@5 from 0.20 (untrained, nprobe=1) to "
        "~0.30 on the near-random corpus; the recall curve, Lloyd "
        "distortion descent, and iters=0/nprobe=1 degeneration to the "
        "untrained operator are pinned in tests/test_ann_recall.py. "
        "Search reuses the SHARED _coarse_cells + _pq_codes_lut "
        "machinery; the oracle replays both trainings and the "
        "multi-probe ADC search end-to-end."
    ),
    "streaming_decontaminate": (
        "Decontamination at the ingest door: the eval slice's 6-gram "
        "set is a STATIC bounded build (benchmark corpora are KB-MB "
        "next to a 100 TB train stream) materialized ONCE — eager "
        "DISK_ONLY localCheckpoint, released when the fold drains — "
        "and broadcast into every micro-batch. Per batch: one narrow "
        "in-row gram projection (slice+concat per position, no "
        "aggregation upstream of the gate), one broadcast LEFT join, "
        "one per-doc max; the fold keeps O(#sources) additive state "
        "via run_foreach_batch because each doc arrives in exactly one "
        "batch. Docs shorter than the gram width produce zero grams "
        "via explode_outer and count clean — the same edge the "
        "oracle's LEFT JOIN takes."
    ),
    "approx_percentile_audit": (
        "One scan + one 3-group ObjectHashAggregate; the cost is the exact-"
        "percentile yardstick buffering every group value, inherent to the "
        "audit. Round-8 A/B: this round's regenerated sf0.1 data has near-"
        "all-distinct l_extendedprice (583k distinct / 600k rows), so each "
        "separate percentile call's per-group value→count map held the "
        "whole column and sorted it independently — six calls ran 4.4s "
        "steady-state vs the 0.23s baseline row taken on lower-cardinality "
        "data (round 7 had measured both forms equal at 0.46s; that "
        "equality does not survive high-distinct data). Fixed by FUSING "
        "the six exact percentiles into one array-argument percentile "
        "(one shared buffer, one sort, six interpolations): 4.4s → 1.6s. "
        "The remaining cost is the exact yardstick itself; the scale path "
        "is the approx side (KLL sketch) — that is the audit's point."
    ),
    "ohlc_candles": (
        "Flagship: scan → partial aggregate → single shuffle on (window, "
        "symbol) → final aggregate. Struct-ordered extrema (min_by/max_by) "
        "are not hash-aggregable, so both halves are SortAggregates — but "
        "state per group is O(1), and min_by beats the struct-min/max "
        "formulation by ~20% (no struct materialization per row)."
    ),
    "q3_shipping_priority": (
        "Broadcast customer dim; one exchange for the lineitem⋈orders agg; "
        "TakeOrderedAndProject caps the result at 10 rows driver-side."
    ),
    "q6_forecast_revenue": (
        "Every predicate is in PushedFilters on the parquet scan; ReadSchema "
        "carries only the referenced columns."
    ),
    "join_asof_purchase_view": (
        "As-of join as union + window last-ignorenulls: ONE exchange on the "
        "join key serves both the sort and the window."
    ),
    "dedup_minhash_lsh": (
        "One shingle-set pass persisted (InMemoryTableScan), band self-join "
        "on bucket keys, array verification — no quadratic candidate join."
    ),
    "pack_sequences": (
        "Two-phase global prefix sum: range exchange, per-partition window, "
        "tiny per-partition offsets broadcast back."
    ),
    "q21_waiting_suppliers": (
        "EXISTS + NOT EXISTS collapsed into one per-order aggregate; every "
        "join after the aggregate is a BroadcastHashJoin."
    ),
    "candle_bollinger": (
        "Analytic window over the candle aggregate: one shuffle on symbol "
        "serves the OHLC groupBy, then the trailing-24 frame runs in the "
        "same partitioning — integer-cent moments keep it bit-stable."
    ),
    "corpus_prep_pipeline": (
        "The full corpus-prep DAG (dedup → quality gate → split → chunk "
        "accounting): two aggregation exchanges total; every filter is a "
        "narrow projection over the scan."
    ),
    "quality_repetition": (
        "Gopher-style repetition signals with ZERO exchanges: bigrams, the "
        "run-length top-bigram fold, and both ratios are all computed "
        "inside the row — a pure map-only pass at any scale."
    ),
    "decontaminate_ngram": (
        "Benchmark trigram set is the build side of a BroadcastHashJoin: "
        "the corpus never shuffles for the membership test; the only wide "
        "stages are doc-keyed (distinct, final count)."
    ),
    "domain_mixture": (
        "Per-language rate table (a handful of rows) broadcast back onto "
        "the corpus: one groupBy(lang) count plus one filtered recount; "
        "integer-exact rates, content-hash sample membership."
    ),
    "dedup_span_windows": (
        "Substring-span dedup: in-row distinct windows exploded once, ONE "
        "count exchange with map-side partials, probe joins only the "
        "filtered duplicated keys (n_docs >= 2) — hot boilerplate phrases "
        "combine before the shuffle instead of skewing a window partition."
    ),
    "skyline_orders": (
        "2D Pareto frontier as a two-phase distributed prefix-min: per-x "
        "collapse exchange, a #buckets-sized global window (tiny), an "
        "in-bucket partitioned window, broadcast threshold join back — "
        "the quadratic NOT-EXISTS of the oracle never executes."
    ),
    "cdc_merge_orders": (
        "MERGE INTO without a table format: target and change batch flow "
        "through ONE hash exchange on the key; row_number(tag DESC, op "
        "ASC) resolves versions exactly like MoR compaction."
    ),
    "anomaly_zscore_events": (
        "Two-pass z-score: decimal-exact stats (5 rows) broadcast back to "
        "a shuffle-free flagging scan — never a window over the 5-value "
        "event_type key."
    ),
    "bm25_search": (
        "BM25 for literal terms: in-row tf, one broadcast stats row, "
        "TakeOrderedAndProject top-20 — no inverted-index shuffle, no "
        "global sort."
    ),
    "join_asof_nearest": (
        "Nearest as-of: BOTH directional window passes over ONE hash "
        "exchange (the second WindowExec re-sorts locally), per-side "
        "tolerance clip, in-row pick — no join operator in the plan."
    ),
    "basket_part_pairs": (
        "Market-basket lift: in-row pair generation from sorted basket "
        "arrays (O(basket^2) per order), one pair-count exchange with "
        "partials, AQE-sized frequency-table joins (part-proportional, no hard hint), TakeOrderedAndProject."
    ),
    "dedup_cross_source": (
        "Cross-corpus contamination matrix: collapsed MinHash-LSH pair "
        "generation (sub-quadratic, duplication-invariant), two hash "
        "joins on doc_id for source lookup, |sources|^2-row rollup."
    ),
    "doc_length_histogram": (
        "Power-of-two length histogram: one map-side-combinable hash "
        "aggregate on an integer-exact bucket (length(bin(x))); the "
        "cumulative window runs over <= 64 bucket rows."
    ),
    "embedding_centroid_assign": (
        "Nearest-centroid audit: ONE (label, pos) hash aggregate over "
        "exploded components builds the centroids; assignment joins a "
        "#labels-row broadcast (no vector-side shuffle); confusion "
        "rollup is |labels|^2 rows."
    ),
    "embedding_quantize_int8": (
        "Int8 quantization audit: per-dim [min,max] collapses to ONE "
        "broadcast row (posexplode → dim hash aggregate, map-side "
        "combined); the quantize+error pass is a scan-shaped in-row "
        "array transform against that broadcast — zero extra exchanges "
        "on the vector side."
    ),
    "cooc_lift_topk": (
        "Token co-occurrence lift: in-row pair combinations (sorted "
        "distinct tokens → one explode, no doc self-join), pair counts "
        "via one map-side-combinable hash aggregate, token-count tables "
        "joined back AQE-sized (vocab-proportional, no hard hint), "
        "TakeOrderedAndProject for the top-50 "
        "(per-task heaps, no global sort)."
    ),
    "part_hierarchy_rollup": (
        "Recursive subtree rollup: the ancestor closure materializes "
        "via pointer doubling (log2(depth) equi-join rounds, eager "
        "localCheckpoint truncates lineage); the rollup itself is one "
        "members⋈measures hash join plus one hash aggregate."
    ),
    "dedup_containment": (
        "Directed containment join: identical-set collapse, rarest-"
        "first probe-side prefix ⋈ full posting list (equi-join on the "
        "shingle key, asymmetric size prune), array verification on "
        "the bounded candidate set, output-bound directed expansion."
    ),
    "inverted_index_champions": (
        "Champion-list index: tf hash aggregate, then a row_number "
        "top-k that plans as WindowGroupLimit with a PARTIAL map-side "
        "pass — a hot term ships k rows per task, never its full "
        "posting list; df table joined back AQE-sized (vocab-proportional, no hard hint)."
    ),
    "conjunctive_search": (
        "Boolean AND retrieval: in-row token filters, zero exchanges — "
        "pure scan → project → filter."
    ),
    "bfs_distance_copurchase": (
        "Level-synchronous BFS: per hop, the NEW frontier joins the "
        "edge list (cost = frontier out-degree, not graph size), "
        "anti-joins the settled set, unions in; recursive-CTE oracle. "
        "Plan shows only the final settled union — rounds execute "
        "eagerly with lineage truncation."
    ),
    "streaming_incremental_candles": (
        "foreachBatch IVM: per micro-batch partial-candle state folded "
        "through the candle monoid with eager localCheckpoint (plan "
        "must not grow with batch count); finalize projects the state."
    ),
    "funnel_timed": (
        "Timed funnel: three SHRINKING per-user stage tables, each "
        "joined back AQE-sized onto a filtered event scan (user-"
        "proportional — no hard hint; runtime-broadcast while small, "
        "co-partitioned on user_id at scale) — sequential deadlines "
        "without any window over raw events."
    ),
    "stats_chi2_independence": (
        "Chi-square: one contingency hash aggregate, windowed margins "
        "over <= |seg|x|status| cells, order-independent quantized-"
        "unit final sum."
    ),
    "candles_incremental_update": (
        "Incremental candle maintenance: base and delta aggregate to "
        "mergeable partial state (extrema kept as (ts,price) keys), "
        "ONE (window,symbol) exchange merges them — hash-equal to the "
        "full recompute by the shared flagship oracle."
    ),
    "spatial_neighbor_pairs": (
        "Grid-blocked distance join: radius-sized cells, probe side "
        "exploded to its 3x3 neighborhood, ONE cell equi-join, exact "
        "integer distance verify — never an all-pairs compare."
    ),
    "pagerank_copurchase": (
        "2-iteration PageRank: per iteration one edges⋈ranks hash join "
        "+ one map-side-combinable destination aggregate; contributions "
        "sum as exact integer 1e-15 units (floor(pr/deg·1e15+0.5)) so "
        "ranks are order-independent bit-for-bit; node table "
        "checkpointed once and reused."
    ),
    "triangle_count_copurchase": (
        "Degree-ordered (compact-forward) triangles: canonical edges → "
        "degree join → orientation by (deg, id) → wedge self-join on the "
        "shared tail → one closing equi-join on the head pair. Out-degree "
        "is O(√m) under any hub skew, so the wedge stage — the only "
        "super-linear candidate — stays bounded; all three joins are "
        "plain shuffles AQE can re-balance."
    ),
    "link_predict_copurchase": (
        "Common-neighbor scoring with a declared pivot degree cap "
        "(stop-node removal): the capped wedge self-join bounds candidate "
        "pairs, existing edges leave via LEFT ANTI, degrees attach with "
        "two joins, and the top-k is TakeOrderedAndProject — no full "
        "sort, no windows over the pair set."
    ),
    "ship_interval_coverage": (
        "Interval-union sweep: orders⋈lineitem equi-join, DISTINCT "
        "interval collapse, then BOTH window layers (running-max-end "
        "island flags, running flag-sum island ids) share ONE "
        "(s, st, en) sort exchange — the plan shows a single Exchange "
        "feeding two Window nodes; final island groupBy is key-local."
    ),
    "zonemap_prune_audit": (
        "Data-skipping audit: one scan unioned under two layout tags, "
        "one (layout, file_id) aggregate building the #files-sized zone "
        "map table, then a 2-row summary. The per-row file id and probe "
        "bounds are computed in-row; no join, no broadcast."
    ),
    "compaction_plan": (
        "OPTIMIZE planning: one running-sum window PARTITIONED BY source "
        "(parallel — per-source file lists are the scheduler's unit), "
        "bin id as exclusive-prefix DIV, one (source, bin) aggregate. "
        "Output is #bins-sized; nothing driver-side."
    ),
    "dataset_shuffle_order": (
        "Epoch shuffle: md5 keys ranked by the two-phase distributed "
        "global rank — range exchange on the hash, parallel per-range "
        "windows, an O(#partitions) offset table broadcast back. No "
        "rand(), no single-partition window; the plan a 100 TB epoch "
        "order wants."
    ),
    "event_transition_matrix": (
        "Markov transitions: ONE user-keyed sort exchange serves the "
        "lead() window; the (from,to) aggregate and the per-row "
        "probability window run over the |types|²-sized matrix."
    ),
    "dedup_survivorship": (
        "Golden-record pass: clustering reuses the collapsed rep graph "
        "(distinct shingle sets) and survivorship is one cluster-keyed "
        "aggregate with the (n_chars, -doc_id) struct-max pick — no "
        "per-pair work after the LSH stage."
    ),
    "snapshot_diff_orders": (
        "Version diff: derive-new is three narrow filters over one scan; "
        "the diff itself is ONE full-outer SortMergeJoin on the key plus a "
        "null-safe scan classifier into a 4-group aggregate. At scale "
        "both snapshots bucket on the key and the join goes exchange-free."
    ),
    "join_cardinality_audit": (
        "Planner audit without the join: two map-side-combinable per-key "
        "counts, an equi-join of the COUNT tables (rows = ndv, never the "
        "join output), and four scalar aggregates broadcast into one row. "
        "Cost is O(distinct keys) however large the estimated join is."
    ),
    "contrastive_pairs": (
        "Edge set = distinct-collapsed basket self-join (shared with "
        "basket_part_pairs); top-50 positives via TakeOrderedAndProject; "
        "negatives are 100 integer-hash rows against a broadcast 1-row "
        "part count, cleaned by one LEFT ANTI join against the edges."
    ),
    "ewma_candles": (
        "Per-partner decay weights rule out a window frame, so the EWMA "
        "is a banded self-join: each candle enumerates 2 candidate 12h "
        "buckets, the join is equi on (symbol, bucket) with fan-out <= 12, "
        "and the integer moments (cents x dyadic weights) make the "
        "aggregate bit-stable. Linear in candles at any scale."
    ),
    "pit_feature_join": (
        "The SCD2 change log (per-user lag-compare) and the as-of join "
        "share ONE hashpartitioning(user_id) layout: the purchase side "
        "unions into the change stream and a last-ignorenulls window "
        "attaches the latest at-or-before state — no range predicate, no "
        "interval explosion, one exchange end to end."
    ),
    "length_bucket_batches": (
        "with_group_rank keeps the dominant length bucket off a single "
        "task: one range exchange over (bucket, md5, doc_id), parallel "
        "local row_numbers, an O(#partitions) offset broadcast, and an "
        "O(#buckets) min-rank broadcast; batch ids are arithmetic on the "
        "rank and the summary aggregate is map-side combinable. The "
        "duplicated rank subtrees in the static plan collapse to "
        "ReusedExchange at runtime (10x point: 1.3x)."
    ),
    "dedup_span_cut": (
        "The extents pipeline (scan-shaped window explode, map-side dup "
        "filter, one doc-keyed sort exchange for the island merge) plus "
        "an O(spans)-per-doc array fold; the cut is an in-row "
        "higher-order filter over (token, index) — the only added "
        "shuffle is the doc-keyed join back to the text. Fully-cut docs "
        "hash to md5('') on both engines (oracle coalesces DuckDB's "
        "NULL array_to_string([]))."
    ),
    "source_interleave_order": (
        "Two two-phase ranks: per-source rank (with_group_rank) then the "
        "global merge rank over integer virtual time (src_rank * stride). "
        "No Window.partitionBy(source); strides are exact integers so the "
        "interleave is bit-reproducible; every exchange below the final "
        "range partition is reused, not recomputed (10x point: 1.2x)."
    ),
    "rolling_active_7d": (
        "Sweep-line rolling distinct: (user, day) dedup exchange, per-user "
        "interval union (parallel per-key windows), then two delta rows per "
        "island into a map-side-combined per-DAY sum. The only unpartitioned "
        "window runs over the calendar-sized delta table — bounded by days, "
        "not rows. No COUNT(DISTINCT) per day, no 7x explode."
    ),
    "attribution_position": (
        "First-purchase aggregate joined back to the scan, per-USER journey "
        "windows (millions of small partitions), then one channel rollup. "
        "Credit is summed as quantized bigint units (floor(c*1e12+0.5)) so "
        "the aggregate is order-independent under any partition layout. "
        "Round-8 A/B of the 2.10x bench row (VERDICT r7): steady-state "
        "0.55s vs 0.29s baseline — but the CONTROL (anomaly_zscore_events, "
        "an unrelated green plan) showed the identical 2.0x drift while "
        "ohlc_candles ran 0.6x, i.e. the whole small-events-aggregate "
        "family shifted with this round's regenerated data/VM state, not "
        "this plan. Plan unchanged; baseline row refreshed with the "
        "round-8 clean run."
    ),
    "anomaly_seasonal_baseline": (
        "Two-pass diurnal monitor: exact decimal-summed mean/sd per "
        "(event_type, hour) cell — bounded at 5x24=120 rows — broadcast "
        "back to a shuffle-free flagging scan, tiny final rollup. Round-8 "
        "A/B of the 1.65x bench row: 0.59s vs 0.29s baseline, identical "
        "drift to the anomaly_zscore_events control (2.0x) while "
        "ohlc_candles ran 0.6x — environment/data-regeneration shift "
        "across the small-events family, not this plan. Plan unchanged; "
        "baseline row refreshed with the round-8 clean run."
    ),
    "shard_checksum_manifest": (
        "One scan, one map-side-combinable aggregate; both checksums (sum, "
        "xor of the rolling hash) are commutative/associative so the "
        "manifest is identical under any executor layout — the property "
        "that makes it a cross-cluster equality witness. Hash values stay "
        "< 2^30; swap the BIGINT sum for DECIMAL(38,0) past ~2^33 rows/shard."
    ),
    "equidepth_bin_apply": (
        "Fit: two-phase global rank over orders (range exchange + "
        "O(#partitions) offset broadcast), ntile arithmetic, 9-row boundary "
        "aggregate folded to ONE broadcast array row. Apply: scan-shaped "
        "higher-order filter over lineitem — bin(x) = 1 + |{ub < x}| — no "
        "join on the big side before the tiny per-bin rollup."
    ),
}


def main() -> None:
    spark = build_session(app_name="make-plans")
    out = [
        "# Physical plans of representative queries\n",
        "Captured from `.explain('formatted')` at sf0.001 — regenerate with",
        "`python tools_make_plans.py`. Plan-shape assertions live in",
        "`tests/test_plan_quality.py`; `plans/linter.py` keeps headline",
        "queries free of scale hazards.\n",
    ]
    for name, note in NOTES.items():
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out.append(f"## {name}\n\n{note}\n\n```\n{tree}\n```\n")
    root = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()

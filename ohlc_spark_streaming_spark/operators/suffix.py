"""Distributed suffix-array span dedup — exact longest duplicated span.

``dedup_span_windows`` (fixed 8-token windows) and ``dedup_span_pow2``
(power-of-two ladder, cap 64) bound the span-dedup family from below;
this module closes it from above with the EXACT answer: for every
document, the length of its longest token span that also occurs at some
other position in the corpus (any document, self-repeats included) —
the quantity a "drop documents sharing a ≥N-token span" policy actually
thresholds on, with no resolution cap.

Spark-first construction (no cap, no quadratic blowup):

1. **Prefix-doubling suffix ranks** (Manber–Myers): ``r_d(doc, pos)``
   dense-ranks each suffix's first ``d`` tokens; ``r_{2d}`` is the dense
   rank of the pair ``(r_d(p), r_d(p+d))`` with −1 past the document
   end. ⌈log₂ max_doc_len⌉ rounds, each one equi-join + one global
   dense rank.
2. **Global dense rank without the single-partition window**:
   ``repartitionByRange`` on the key (equal keys co-locate by range
   partitioning) → per-partition ``dense_rank`` → cumulative
   distinct-count offsets (one bounded ≤#partitions-row collect,
   broadcast back). Every step is a sort or hash join Catalyst already
   distributes — this is the DataFrame-native zipWithIndex.
3. **Adjacent-pair LCPs**: suffixes ordered by final rank; each suffix's
   best match is an SA-order neighbor (LCP to any other suffix is the
   range-min, so the max is adjacent), and the neighbor LCP is computed
   by descending the stored rank tables (add ``d`` when ``r_d`` agrees
   at the shifted positions), capped by the shorter suffix for the
   padded-equal tail case.
4. Per-document: exact span = max neighbor-LCP over its suffixes;
   ``n_at_max`` = how many of its positions achieve it.

Memory discipline (the round-10 fix for the 100×/16 GiB cliff):
above DISTRIBUTED_RANK_THRESHOLD tokens every intermediate — the
⌈log₂ L⌉ rank tables, the token table, each descent level of the
adjacent-pair frame — is localCheckpoint'd at
``StorageLevel.DISK_ONLY`` (never resident in executor heap), its block
ids are tracked at checkpoint time, and it is RELEASED (blocks dropped)
the moment the next materialization no longer needs it: each rank table
right after its descent level lands, each pairs level right after its
successor lands, everything else when the final per-doc frame (one row
per document) is materialized. HEAP therefore holds ONE level in
flight; DISK peaks at O(tokens · log L) at the end of the forward pass
(all rank tables must exist before the descent starts — ~11 tables of
~24 bytes/token at 2k-token documents) and shrinks one table per
descent level. The round-9 failure was the same O(tokens · log L)
living in executor HEAP, which OOM'd a 16 GiB JVM at 27M tokens
(measured after: 27M tokens in ~400s on the same 16 GiB JVM). BELOW the
threshold the retained tables are megabytes, so the descent stays one
lazy plan with a single materialization at the end (the ~log L extra
per-level checkpoints cost ~2× wall-time at 270k tokens) — everything
is still released before return, just all at once.

Cost: O(log L) rounds of {range sort, hash join} over one row per token
— at 100 TB with 2k-token documents that is ~11 rounds over the token
table, versus a 2000× gram blowup for the brute ladder (the DuckDB
oracle runs the brute form, which is fine at oracle scale and proves
the SA machinery end-to-end).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textops import tokens

#: Token count above which the rank rounds switch to the distributed
#: (range-partitioned) strategy; below it a single-partition window wins
#: on fixed per-round cost.
DISTRIBUTED_RANK_THRESHOLD = 5_000_000

#: Floor for the distributed global-rank sorts: every prefix-doubling
#: round pays fixed per-task scheduling overhead, so small inputs want
#: FEW partitions. rank_partitions() scales above the floor with input
#: volume so each range partition holds a bounded row count at any
#: scale (1000x data -> 1000x partitions, not 1000x rows per task).
_RANK_PARTITIONS = 8

#: Target rows per range partition in the distributed rank: ~4M rows of
#: (doc_id, pos, r) sort comfortably inside one task's execution memory.
_RANK_ROWS_PER_PARTITION = 4_000_000


def rank_partitions(n_rows: int) -> int:
    """Partition count for the distributed global rank at ``n_rows``:
    the fixed floor below ~32M rows (scheduling overhead dominates),
    then one partition per ~4M rows so per-task sort memory stays flat
    as the corpus grows — the 100 TB posture for an operator whose
    per-round cost is a range sort."""
    return max(_RANK_PARTITIONS, -(-n_rows // _RANK_ROWS_PER_PARTITION))

#: All suffix-machinery intermediates live on disk, never in executor
#: heap — the tables are consumed a bounded number of times each, and
#: heap residency is what turned O(log L) retained tables into an OOM.
_SPILL = StorageLevel.DISK_ONLY


def _persistent_ids(spark: SparkSession) -> set[int]:
    """Ids of every block-manager-persisted RDD (includes local
    checkpoints, which `DataFrame.unpersist` cannot reach)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_blocks(spark: SparkSession, ids: set[int]) -> None:
    """Drop the storage blocks of the given persisted-RDD ids (no-op for
    ids already cleaned). For locally-checkpointed RDDs this FREES the
    data irrevocably — only call once every consumer has materialized."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)


def _ckpt(
    df: DataFrame, track: list[int] | None = None, spill: bool = False
) -> DataFrame:
    """Eager localCheckpoint — DISK_ONLY when ``spill`` (the
    above-threshold path keeps nothing in executor heap), default
    storage below it; appends the newly persisted RDD ids to ``track``
    so the caller can release them deterministically (the id diff is
    snapshotted tightly around this one call)."""
    spark = df.sparkSession
    before = _persistent_ids(spark) if track is not None else set()
    out = df.localCheckpoint(
        eager=True, storageLevel=_SPILL if spill else None
    )
    if track is not None:
        track.extend(_persistent_ids(spark) - before)
    return out


class RankTable(NamedTuple):
    """One prefix-doubling level: ``df`` dense-ranks each suffix's first
    ``d`` tokens; ``ids`` are its checkpoint block ids for release."""

    d: int
    df: DataFrame
    ids: tuple[int, ...]


def global_dense_rank(
    df: DataFrame,
    key_cols: list[str],
    distributed: bool = False,
    track: list[int] | None = None,
    spill: bool = False,
    partitions: int = _RANK_PARTITIONS,
) -> DataFrame:
    """Append a global 0-based DENSE rank column ``gr`` ordered by
    ``key_cols``. Always returns a MATERIALIZED (DISK_ONLY
    localCheckpoint) frame: every prefix-doubling round consumes its
    predecessor twice, so an unchecked plan doubles per round —
    exponential plan size (observed: optimizer OOM at 9 rounds). New
    block ids are appended to ``track`` for deterministic release.

    Two strategies, chosen by the CALLER from the input size (the same
    size-adaptive choice AQE makes for joins):

    * ``distributed=False`` — one global-sort window. A single-partition
      WindowExec is exactly right below ~5M rows: one task beats the
      per-round scheduling cost of a range shuffle by ~5×, and the sort
      is the same O(n log n) either way.
    * ``distributed=True`` — the cluster path, no single-partition
      funnel: repartitionByRange co-locates equal keys, a per-partition
      dense_rank orders within, and per-partition DISTINCT-key counts
      (≤ #partitions rows, a bounded driver fence) become broadcast
      offsets. Boundary placement is sampling-dependent but the global
      rank is boundary-invariant. Equality with the window path is
      pinned in tests/test_suffix.py.
    """
    if not distributed:
        w = Window.orderBy(*key_cols)
        return _ckpt(
            df.withColumn("gr", (F.dense_rank().over(w) - 1).cast("long")),
            track,
            spill,
        )
    rp = df.repartitionByRange(partitions, *key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    rp = rp.persist(_SPILL)
    # Distinct over the STRUCT of the keys, not count_distinct(*cols):
    # the multi-column form skips rows where ANY key is NULL, which
    # would shift every later partition's offset; a struct is non-null
    # even with null fields, matching dense_rank's nulls-first order.
    counts = (
        rp.groupBy("_pid")
        .agg(F.count_distinct(F.struct(*key_cols)).alias("_n"))
        .collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r._pid):
        offsets[row._pid] = acc
        acc += row._n
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    out = _ckpt(
        rp.withColumn("_lr", F.dense_rank().over(w).cast("long"))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("gr", F.col("_off") + F.col("_lr") - 1)
        .drop("_pid", "_lr", "_off"),
        track,
        spill,
    )
    rp.unpersist()
    return out


def _rank_lookup(ranks: DataFrame, tag: str) -> DataFrame:
    return ranks.select(
        F.col("doc_id").alias(f"{tag}_doc"),
        F.col("pos").alias(f"{tag}_pos"),
        F.col("r").alias(f"{tag}_r"),
    )


def suffix_rank_tables(
    tok: DataFrame,
    max_len: int,
    distributed: bool = False,
    spill: bool = False,
    partitions: int = _RANK_PARTITIONS,
) -> list[RankTable]:
    """Prefix-doubling rank tables for d = 1, 2, 4, … ≥ max_len.
    ``tok``: (doc_id, pos, token) with pos 1-based; each table's ``df``
    is (doc_id, pos, r) where r dense-ranks the suffix's first d tokens
    (−1 sentinel for past-end comparisons). Each table is checkpointed
    DISK_ONLY with its block ids captured — the LCP descent releases
    level d the moment its contribution is materialized
    (suffix_span_exact), and ``release_rank_tables`` frees any
    remainder."""
    track: list[int] = []
    r = global_dense_rank(
        tok, ["token"], distributed, track, spill, partitions
    ).select("doc_id", "pos", F.col("gr").alias("r"))
    tables = [RankTable(1, r, tuple(track))]
    d = 1
    # Round-13 (guide §2.4): the shifted-rank pairing is lead(r, d) over
    # (doc, pos) — positions are dense 1..len per document, so the lead
    # value IS the rank at pos+d and a past-end lead is null, exactly
    # the left-join-miss the previous self-join encoded. One exchange +
    # sort per round instead of the join's two exchanges + two sorts;
    # values are bitwise identical.
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    while d < max_len:
        paired = r.select(
            "doc_id",
            "pos",
            F.col("r").alias("r1"),
            F.coalesce(F.lead("r", d).over(w_doc), F.lit(-1)).alias("r2"),
        )
        track = []
        r = global_dense_rank(
            paired, ["r1", "r2"], distributed, track, spill, partitions
        ).select("doc_id", "pos", F.col("gr").alias("r"))
        d *= 2
        tables.append(RankTable(d, r, tuple(track)))
    return tables


def release_rank_tables(
    spark: SparkSession, tables: list[RankTable]
) -> None:
    """Free the checkpoint blocks of every table in the list."""
    for t in tables:
        release_blocks(spark, set(t.ids))


class PositionBest(NamedTuple):
    """Per-position longest-duplicated-span frame plus its retention
    bookkeeping: ``df`` is (doc_id, pos, best); ``hold_ids`` are the
    block ids the frame still depends on (release AFTER the last
    consumer materializes); ``progressive`` says which retention mode
    produced it (above the token threshold the frame itself is the only
    held block; below it, the token + pair frames ride along lazily)."""

    df: DataFrame
    hold_ids: tuple[int, ...]
    progressive: bool


class SAFrames(NamedTuple):
    """Shared suffix-array build: SA order + adjacent-pair LCPs, with
    retention bookkeeping. ``sa`` is (doc_id, pos, idx); ``capped`` is
    (a_doc, a_pos, b_doc, b_pos, lcp) for SA-adjacent pairs — prefixed
    with the pair's SA index ``idx`` (row ``idx`` holds LCP(sa[idx],
    sa[idx+1]), capped by the shorter suffix) only when the build ran
    with ``keep_sa``. ``sa_ids`` is non-empty only under ``keep_sa``;
    the caller then owns the SA frame's release."""

    toks: DataFrame
    tok_ids: tuple[int, ...]
    sa: DataFrame
    sa_ids: tuple[int, ...]
    capped: DataFrame
    capped_ids: tuple[int, ...]
    progressive: bool
    n_tokens: int


def _sa_adjacent_lcp(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_sa: bool = False,
) -> SAFrames | None:
    """Build the suffix array over the whole corpus and the adjacent-pair
    LCP frame — the shared core of within-corpus span scoring
    (suffix_position_best) and cross-corpus contamination scoring
    (cross_contamination_best). Returns None for a token-less corpus.
    See the module docstring for the construction; retention follows the
    size-adaptive progressive-release discipline (O(log L) rank tables
    are ALWAYS released before return). With ``keep_sa`` the SA frame's
    blocks survive the build (the cross-corpus path reads SA order
    again); otherwise they are released with the first descent level."""
    spark = docs.sparkSession
    # Corpus stats BEFORE exploding: one narrow aggregate over documents
    # decides strategy AND storage level, so the token table itself can
    # be checkpointed at the right tier from the start.
    n_tok_col = F.size(tokens(text_col))
    stats = docs.agg(
        F.max(n_tok_col).alias("mx"),
        F.sum(n_tok_col.cast("long")).alias("n"),
    ).collect()[0]
    max_len, n_tokens = stats["mx"] or 0, stats["n"] or 0
    distributed = n_tokens > DISTRIBUTED_RANK_THRESHOLD
    progressive = distributed  # retention is MBs below the threshold
    if max_len == 0:
        return None

    tok_ids: list[int] = []
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos0", "token"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    toks = _ckpt(toks, tok_ids, progressive)
    doc_len = toks.groupBy("doc_id").agg(F.max("pos").alias("len"))

    n_parts = rank_partitions(n_tokens)
    tables = suffix_rank_tables(
        toks, max_len, distributed, progressive, n_parts
    )
    final = tables[-1].df

    # Suffix-array order: final rank ties = fully identical suffixes;
    # (r, doc, pos) makes the index key unique, and identical suffixes
    # end up adjacent regardless of the arbitrary tie order.
    sa_ids: list[int] = []
    sa = global_dense_rank(
        final,
        ["r", "doc_id", "pos"],
        distributed,
        sa_ids,
        progressive,
        n_parts,
    ).select("doc_id", "pos", F.col("gr").alias("idx"))
    # The last table is only a descent level when its d ≤ max_len; the
    # overshoot table (d > max_len) has served its purpose once the SA
    # order is materialized — free it now.
    if progressive and tables[-1].d > max_len:
        release_blocks(spark, set(tables[-1].ids))
    succ = sa.select(
        (F.col("idx") - 1).alias("idx"),
        F.col("doc_id").alias("b_doc"),
        F.col("pos").alias("b_pos"),
    )
    # The SA index rides along only when the caller keeps the SA frame
    # (the cross-corpus path keys its window passes on it); the
    # within-corpus path stays the exact r10 frame shape — one long
    # narrower through every descent level.
    carry = ["idx"] if keep_sa else []
    pairs = sa.join(succ, "idx").select(
        *carry,
        F.col("doc_id").alias("a_doc"),
        F.col("pos").alias("a_pos"),
        "b_doc",
        "b_pos",
        F.lit(0).cast("long").alias("lcp"),
    )

    # Descend the rank tables top-down: add d whenever the d-ranks agree
    # at the lcp-shifted positions (absent = past end = no match). In
    # progressive mode each level MATERIALIZES the pairs frame
    # (DISK_ONLY), then releases the table it consumed and the previous
    # pairs level — peak footprint bounded to one level in flight. In
    # the small-corpus mode the loop just builds one lazy plan.
    prev_ids: set[int] = set() if keep_sa else set(sa_ids)
    for t in sorted(tables, key=lambda t: -t.d):
        if t.d > max_len:
            continue
        ra = _rank_lookup(t.df, "ra")
        rb = _rank_lookup(t.df, "rb")
        pairs = (
            pairs.join(
                ra,
                (F.col("a_doc") == F.col("ra_doc"))
                & (F.col("a_pos") + F.col("lcp") == F.col("ra_pos")),
                "left",
            )
            .join(
                rb,
                (F.col("b_doc") == F.col("rb_doc"))
                & (F.col("b_pos") + F.col("lcp") == F.col("rb_pos")),
                "left",
            )
            .select(
                *carry,
                "a_doc",
                "a_pos",
                "b_doc",
                "b_pos",
                F.when(
                    F.col("ra_r").isNotNull()
                    & (F.col("ra_r") == F.col("rb_r")),
                    F.col("lcp") + F.lit(t.d),
                )
                .otherwise(F.col("lcp"))
                .alias("lcp"),
            )
        )
        if progressive:
            level_ids: list[int] = []
            pairs = _ckpt(pairs, level_ids, True)
            release_blocks(spark, prev_ids | set(t.ids))
            prev_ids = set(level_ids)

    # Padded-equal tail overshoots: cap by the shorter suffix.
    la = doc_len.select(
        F.col("doc_id").alias("a_doc"), F.col("len").alias("a_len")
    )
    lb = doc_len.select(
        F.col("doc_id").alias("b_doc"), F.col("len").alias("b_len")
    )
    capped_ids: list[int] = []
    capped = _ckpt(
        pairs.join(la, "a_doc")
        .join(lb, "b_doc")
        .select(
            *carry,
            "a_doc",
            "a_pos",
            "b_doc",
            "b_pos",
            F.least(
                F.col("lcp"),
                F.col("a_len") - F.col("a_pos") + 1,
                F.col("b_len") - F.col("b_pos") + 1,
            ).alias("lcp"),
        ),
        # The per-suffix union and downstream probes read this more
        # than once — an unmaterialized plan would re-run the descent.
        capped_ids,
        progressive,
    )
    # Progressive: only the last pairs level remains (plus the SA frame
    # when the caller keeps it); small-corpus: the whole descent just
    # executed, so every rank table and the non-kept SA frame can be
    # bulk-released now.
    release_blocks(spark, prev_ids)
    if not progressive:
        release_rank_tables(spark, tables)
    return SAFrames(
        toks,
        tuple(tok_ids),
        sa,
        tuple(sa_ids) if keep_sa else (),
        capped,
        tuple(capped_ids),
        progressive,
        n_tokens,
    )


def suffix_position_best(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> PositionBest:
    """For every token position: the length of the longest span STARTING
    there that also occurs elsewhere in the corpus (0 if none) — the
    suffix-array primitive both exact-span scoring (suffix_span_exact)
    and exact span-CUTTING (dedup_span_cut_suffix) consume. See the
    module docstring for the construction; retention follows the
    size-adaptive progressive-release discipline (O(log L) rank tables
    are ALWAYS released before return)."""
    spark = docs.sparkSession
    fr = _sa_adjacent_lcp(docs, id_col, text_col, keep_sa=False)
    if fr is None:
        empty = docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(1).cast("long").alias("pos"),
            F.lit(0).cast("long").alias("best"),
        ).limit(0)
        return PositionBest(empty, (), False)
    toks, capped, progressive = fr.toks, fr.capped, fr.progressive

    # Per-suffix best neighbor LCP (pred or succ). LEFT join from ALL
    # positions: with n ≥ 2 suffixes every position appears in an
    # adjacent pair, but the degenerate single-suffix corpus has none —
    # its position still achieves best = 0 and must count downstream
    # (hypothesis-found edge).
    pair_best = (
        capped.select(
            F.col("a_doc").alias("doc_id"),
            F.col("a_pos").alias("pos"),
            "lcp",
        )
        .unionByName(
            capped.select(
                F.col("b_doc").alias("doc_id"),
                F.col("b_pos").alias("pos"),
                "lcp",
            )
        )
        .groupBy("doc_id", "pos")
        .agg(F.max("lcp").alias("best"))
    )
    per_suffix = (
        toks.select("doc_id", "pos")
        .join(pair_best, ["doc_id", "pos"], "left")
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.coalesce(F.col("best"), F.lit(0)).cast("long").alias("best"),
        )
    )
    if progressive:
        # One row per TOKEN but the only retained frame: materialize it
        # (DISK_ONLY) and free the token + pair frames immediately.
        ps_ids: list[int] = []
        per_suffix = _ckpt(per_suffix, ps_ids, True)
        release_blocks(spark, set(fr.tok_ids) | set(fr.capped_ids))
        return PositionBest(per_suffix, tuple(ps_ids), True)
    # Below the threshold the lazy plan still reads toks and capped;
    # their two O(tokens) frames stay until the caller drops the result
    # (the ContextCleaner reclaims local-checkpoint blocks once the
    # DataFrame is unreachable) — eager materialization would forfeit
    # the stage elimination a bare count() gets from Catalyst.
    return PositionBest(per_suffix, fr.tok_ids + fr.capped_ids, False)


def _prefix_sum(
    df: DataFrame,
    val_col: str,
    order_col: str,
    out_col: str,
    distributed: bool = False,
    track: list[int] | None = None,
    partitions: int = _RANK_PARTITIONS,
) -> tuple[DataFrame, int | None]:
    """Running SUM of ``val_col`` in ``order_col`` order, INCLUSIVE of
    the current row — the same two strategies as global_dense_rank:
    one global-sort window below the threshold; repartitionByRange +
    per-partition running sums + broadcast cumulative offsets above it
    (a bounded ≤#partitions-row driver fence, no single-partition
    funnel). Returns ``(frame, grand_total)``; the total is a free
    by-product of the distributed offset accumulation and None in the
    window branch (where the caller's own frame is cheap to aggregate).
    The distributed output is DISK_ONLY-checkpointed with its block ids
    appended to ``track`` (same deterministic-release contract as
    global_dense_rank — the intermediate rp cache is unpersisted here,
    never left to the ContextCleaner)."""
    if not distributed:
        w = Window.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return df.withColumn(out_col, F.sum(val_col).over(w)), None
    rp = df.repartitionByRange(partitions, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    rp = rp.persist(_SPILL)
    sums = rp.groupBy("_pid").agg(F.sum(val_col).alias("_s")).collect()
    offsets = {}
    acc = 0
    for row in sorted(sums, key=lambda r: r._pid):
        offsets[row._pid] = acc
        acc += row._s or 0
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = _ckpt(
        rp.withColumn("_ls", F.sum(val_col).over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_ls")).cast("long"))
        .drop("_pid", "_ls", "_off"),
        track,
        True,
    )
    rp.unpersist()
    return out, int(acc)


def cross_contamination_position_best(
    docs: DataFrame,
    eval_flag,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> PositionBest:
    """For every TRAIN token position: the length of the longest span
    STARTING there that also occurs anywhere in the EVAL subset
    (``eval_flag`` — a boolean Column over ``docs``) — the cross-corpus
    twin of suffix_position_best, consumed by contamination scoring
    (cross_contamination_best) and contamination CUTTING
    (decontaminate_cut). ``df`` is (doc_id, pos, best) over train
    positions only; same retention contract as suffix_position_best.

    Construction (suffix array over the UNION corpus): a train suffix's
    longest common prefix with the eval set is attained at the NEAREST
    eval suffix in SA order on either side (pair LCP = range-min of
    adjacent LCPs, so moving past the nearest eval suffix can only
    shrink the min). With ``grp[i]`` = running count of eval suffixes
    at/before SA index i, every (eval suffix, following train run) is
    one grp partition whose head is the eval row, and

    * up[i]   = min of adjacent-LCP(pred) over the partition rows after
      the head up to i (head masked out; its pred-LCP points outside
      the range),
    * down[i] = the symmetric pass on grp2 = (total − grp + is_eval),
      ordered DESC, min over rows strictly preceding i (the head eval
      row's pred-LCP is IN range this time).

    contam(i) = greatest(up, down) — two partitioned window passes over
    one row per token, after one prefix count (size-adaptive: global
    window below the rank threshold, range-partitioned running sums +
    broadcast offsets above). Same O(tokens · log L) bound and
    progressive-release discipline as suffix_position_best; exactness
    is pinned against a python brute force in
    tests/test_suffix_property.py."""
    spark = docs.sparkSession
    flags = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(eval_flag, F.lit(1)).otherwise(F.lit(0)).alias("is_eval"),
    )
    fr = _sa_adjacent_lcp(docs, id_col, text_col, keep_sa=True)
    if fr is None:
        empty = docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(1).cast("long").alias("pos"),
            F.lit(0).cast("long").alias("best"),
        ).limit(0)
        return PositionBest(empty, (), False)
    distributed = fr.progressive
    n_parts = rank_partitions(fr.n_tokens)

    # lcp_pred[i] = LCP(sa[i-1], sa[i]) — the only LCP orientation both
    # window passes need (see docstring derivation).
    lp = fr.capped.select(
        (F.col("idx") + 1).alias("idx"), F.col("lcp").alias("lcp_pred")
    )
    rows = fr.sa.join(lp, "idx", "left").join(flags, "doc_id")
    ps_track: list[int] = []
    rows, e_total = _prefix_sum(
        rows, "is_eval", "idx", "grp", distributed, ps_track, n_parts
    )
    if e_total is None:
        # Window branch: the grand total is one tiny aggregate over the
        # (small, sub-threshold) rows frame — never a re-scan of the SA.
        e_total = int(
            rows.agg(F.coalesce(F.sum("is_eval"), F.lit(0))).collect()[0][0]
        )
    rows = rows.withColumn(
        "grp2", F.lit(e_total) - F.col("grp") + F.col("is_eval")
    )

    w_up = (
        Window.partitionBy("grp")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_dn = (
        Window.partitionBy("grp2")
        .orderBy(F.col("idx").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    masked = F.when(F.col("is_eval") == 1, F.lit(None)).otherwise(
        F.col("lcp_pred")
    )
    up = F.when(F.col("grp") > 0, F.min(masked).over(w_up))
    down = F.when(F.col("grp2") > 0, F.min(F.col("lcp_pred")).over(w_dn))
    # The window columns MUST materialize before the eval-row filter:
    # a filter upstream of the window would delete the partition heads
    # (the eval rows) the passes pivot on — observed as silently
    # shifted per-position bests on the tiny-corpus brute check.
    per_pos = (
        rows.withColumn("_up", up)
        .withColumn("_down", down)
        .where(F.col("is_eval") == 0)
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.coalesce(F.greatest("_up", "_down"), F.lit(0))
            .cast("long")
            .alias("best"),
        )
    )
    held = (
        set(fr.tok_ids)
        | set(fr.sa_ids)
        | set(fr.capped_ids)
        | set(ps_track)
    )
    if fr.progressive:
        # One row per TRAIN token but the only retained frame:
        # materialize it (DISK_ONLY) and free everything else.
        ps_ids: list[int] = []
        per_pos = _ckpt(per_pos, ps_ids, True)
        release_blocks(spark, held)
        return PositionBest(per_pos, tuple(ps_ids), True)
    return PositionBest(per_pos, tuple(held), False)


def cross_contamination_best(
    docs: DataFrame,
    eval_flag,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT cross-corpus contamination span per TRAIN document: the
    length of the longest token span that also occurs anywhere in the
    EVAL subset, plus how many positions achieve it — the
    decontamination quantity a "drop/cut training docs sharing a
    ≥N-token span with the benchmark" policy thresholds on, exact at
    every N at once (decontaminate_ngram is fixed-N). Output:
    (doc_id, contam_span, n_at_max), train docs only. See
    cross_contamination_position_best for the construction."""
    flags = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(eval_flag, F.lit(1)).otherwise(F.lit(0)).alias("is_eval"),
    )
    train_docs = flags.where(F.col("is_eval") == 0).select("doc_id")
    pb = cross_contamination_position_best(docs, eval_flag, id_col, text_col)
    per_doc = pb.df.groupBy("doc_id").agg(
        F.max("best").alias("contam_span")
    )
    n_at_max = (
        pb.df.join(per_doc, "doc_id")
        .where(F.col("best") == F.col("contam_span"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_at_max"))
    )
    out = (
        train_docs.join(per_doc, "doc_id", "left")
        .join(n_at_max, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("contam_span"), F.lit(0))
            .cast("long")
            .alias("contam_span"),
            F.coalesce(F.col("n_at_max"), F.lit(0))
            .cast("long")
            .alias("n_at_max"),
        )
    )
    return materialize_and_release(out, pb)


def materialize_and_release(result: DataFrame, pb: PositionBest) -> DataFrame:
    """Apply ``pb``'s retention contract to a frame DERIVED from its
    ``df``: in progressive mode, eagerly checkpoint the (small) result
    and free the held per-position blocks; in lazy mode return the plan
    untouched. The one public seam consumers need — no caller touches
    the private checkpoint/tracking helpers."""
    if pb.progressive:
        result = _ckpt(result)
        release_blocks(result.sparkSession, set(pb.hold_ids))
    return result


def suffix_span_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact longest duplicated token-span per document (see module
    docstring). Output: (doc_id, span_exact, n_at_max) — by return
    time the O(log L) rank tables have been released in BOTH modes;
    HEAP retention is never O(tokens · log L) again.

    Above DISTRIBUTED_RANK_THRESHOLD tokens the retention is the
    progressive-release path (suffix_position_best) and the returned
    one-row-per-doc frame is materialized with everything else freed;
    below it the plan is lazy end-to-end."""
    pb = suffix_position_best(docs, id_col, text_col)
    per_suffix = pb.df
    per_doc = per_suffix.groupBy("doc_id").agg(
        F.max("best").alias("span_exact")
    )
    n_at_max = (
        per_suffix.join(per_doc, "doc_id")
        .where(F.col("best") == F.col("span_exact"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_at_max"))
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .join(n_at_max, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("span_exact"), F.lit(0))
            .cast("long")
            .alias("span_exact"),
            F.coalesce(F.col("n_at_max"), F.lit(0))
            .cast("long")
            .alias("n_at_max"),
        )
    )
    return materialize_and_release(out, pb)

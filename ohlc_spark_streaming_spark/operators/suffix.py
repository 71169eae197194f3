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

Cost: O(log L) rounds of {range sort, hash join} over one row per token
— at 100 TB with 2k-token documents that is ~11 rounds over the token
table, versus a 2000× gram blowup for the brute ladder (the DuckDB
oracle runs the brute form, which is fine at oracle scale and proves
the SA machinery end-to-end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textops import tokens

#: Token count above which the rank rounds switch to the distributed
#: (range-partitioned) strategy; below it a single-partition window wins
#: on fixed per-round cost.
DISTRIBUTED_RANK_THRESHOLD = 5_000_000

#: Partitions for the global rank sorts. Modest on purpose: every
#: prefix-doubling round pays fixed per-task scheduling overhead, and
#: the token tables here are ≤ ~300k rows; a cluster deployment would
#: scale this with input volume.
_RANK_PARTITIONS = 8


def global_dense_rank(
    df: DataFrame, key_cols: list[str], distributed: bool = False
) -> DataFrame:
    """Append a global 0-based DENSE rank column ``gr`` ordered by
    ``key_cols``. Always returns a MATERIALIZED (localCheckpoint) frame:
    every prefix-doubling round consumes its predecessor twice, so an
    unchecked plan doubles per round — exponential plan size (observed:
    optimizer OOM at 9 rounds).

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
        return df.withColumn(
            "gr", (F.dense_rank().over(w) - 1).cast("long")
        ).localCheckpoint(eager=True)
    rp = df.repartitionByRange(_RANK_PARTITIONS, *key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    rp = rp.persist()
    counts = (
        rp.groupBy("_pid")
        .agg(F.count_distinct(*[F.col(c) for c in key_cols]).alias("_n"))
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
    out = (
        rp.withColumn("_lr", F.dense_rank().over(w).cast("long"))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("gr", F.col("_off") + F.col("_lr") - 1)
        .drop("_pid", "_lr", "_off")
        .localCheckpoint(eager=True)
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
    tok: DataFrame, max_len: int, distributed: bool = False
) -> list[tuple[int, DataFrame]]:
    """Prefix-doubling rank tables ``[(d, ranks)]`` for d = 1, 2, 4, …
    ≥ max_len. ``tok``: (doc_id, pos, token) with pos 1-based;
    ``ranks``: (doc_id, pos, r) where r dense-ranks the suffix's first
    d tokens (−1 sentinel for past-end comparisons). Each table is
    persisted — callers release via ``release_rank_tables``."""
    r = global_dense_rank(tok, ["token"], distributed).select(
        "doc_id", "pos", F.col("gr").alias("r")
    )
    tables = [(1, r)]
    d = 1
    while d < max_len:
        nxt = _rank_lookup(r, "n")
        paired = r.join(
            nxt,
            (F.col("doc_id") == F.col("n_doc"))
            & (F.col("pos") + F.lit(d) == F.col("n_pos")),
            "left",
        ).select(
            "doc_id",
            "pos",
            F.col("r").alias("r1"),
            F.coalesce(F.col("n_r"), F.lit(-1)).alias("r2"),
        )
        r = global_dense_rank(paired, ["r1", "r2"], distributed).select(
            "doc_id", "pos", F.col("gr").alias("r")
        )
        d *= 2
        tables.append((d, r))
    return tables


def suffix_span_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact longest duplicated token-span per document (see module
    docstring). Output: (doc_id, span_exact, n_at_max)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos0", "token"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    toks = toks.localCheckpoint(eager=True)
    doc_len = toks.groupBy("doc_id").agg(F.max("pos").alias("len"))
    stats = toks.groupBy().agg(
        F.max(F.col("pos")).alias("mx"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    max_len, n_tokens = stats["mx"] or 0, stats["n"]
    distributed = n_tokens > DISTRIBUTED_RANK_THRESHOLD
    if max_len == 0:
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("span_exact"),
            F.lit(0).cast("long").alias("n_at_max"),
        )

    tables = suffix_rank_tables(toks, max_len, distributed)
    final = tables[-1][1]

    # Suffix-array order: final rank ties = fully identical suffixes;
    # (r, doc, pos) makes the index key unique, and identical suffixes
    # end up adjacent regardless of the arbitrary tie order.
    sa = global_dense_rank(final, ["r", "doc_id", "pos"], distributed).select(
        "doc_id", "pos", F.col("gr").alias("idx")
    )
    succ = sa.select(
        (F.col("idx") - 1).alias("idx"),
        F.col("doc_id").alias("b_doc"),
        F.col("pos").alias("b_pos"),
    )
    pairs = sa.join(succ, "idx").select(
        F.col("doc_id").alias("a_doc"),
        F.col("pos").alias("a_pos"),
        "b_doc",
        "b_pos",
        F.lit(0).cast("long").alias("lcp"),
    )

    # Descend the rank tables: add d whenever the d-ranks agree at the
    # lcp-shifted positions (absent = past end = no match).
    for d, ranks in sorted(tables, key=lambda t: -t[0]):
        if d > max_len:
            continue
        ra = _rank_lookup(ranks, "ra")
        rb = _rank_lookup(ranks, "rb")
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
                "a_doc",
                "a_pos",
                "b_doc",
                "b_pos",
                F.when(
                    F.col("ra_r").isNotNull()
                    & (F.col("ra_r") == F.col("rb_r")),
                    F.col("lcp") + F.lit(d),
                )
                .otherwise(F.col("lcp"))
                .alias("lcp"),
            )
        )

    # Padded-equal tail overshoots: cap by the shorter suffix.
    la = doc_len.select(
        F.col("doc_id").alias("a_doc"), F.col("len").alias("a_len")
    )
    lb = doc_len.select(
        F.col("doc_id").alias("b_doc"), F.col("len").alias("b_len")
    )
    capped = (
        pairs.join(la, "a_doc")
        .join(lb, "b_doc")
        .select(
            "a_doc",
            "a_pos",
            "b_doc",
            "b_pos",
            F.least(
                F.col("lcp"),
                F.col("a_len") - F.col("a_pos") + 1,
                F.col("b_len") - F.col("b_pos") + 1,
            ).alias("lcp"),
        )
        # ONE materialization of the whole descent chain: the per-suffix
        # union and the n_at_max probe below each read this twice — an
        # unchained plan would re-execute the 14-join descent 4x+.
        .localCheckpoint(eager=True)
    )

    # Per-suffix best neighbor LCP (pred or succ), then per-doc max +
    # count of positions achieving it.
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
    # LEFT join from ALL positions: with n ≥ 2 suffixes every position
    # appears in an adjacent pair, but the degenerate single-suffix
    # corpus has none — its position still achieves best = 0 and must
    # count toward n_at_max (hypothesis-found edge).
    per_suffix = (
        toks.select("doc_id", "pos")
        .join(pair_best, ["doc_id", "pos"], "left")
        .select(
            "doc_id", "pos", F.coalesce(F.col("best"), F.lit(0)).alias("best")
        )
    )
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
    return out

"""Round-13 operator pins: ADC-shortlist exact re-rank (FAISS
IndexRefineFlat shape — VERDICT r12 item 2) and its recall lift over
the plain residual index."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.queries.ann_oracles import _RES_ITERS
from ohlc_spark_streaming_spark.operators.similarity import (
    ann_index_search,
    ann_index_search_refined,
    train_ann_index,
)
from ohlc_spark_streaming_spark.functions.vectorops import as_double_array
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def _queries(emb, n=10):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("_e"),
    )


def test_refine_lifts_recall_over_residual(spark):
    """VERDICT r12 item 2's Done condition: the exact re-rank of the
    ADC top-4k shortlist lifts recall@5 over the plain residual index.
    Deterministic computation on fixed data, so the measured recalls
    are exact: refine 0.64 vs residual 0.34 at sf0.001 (0.72 vs 0.34
    at sf0.01 — the driver-checked pair ann_recall_refine /
    ann_recall_residual)."""
    from .test_ann_recall import _exact_l2_topk
    from .test_round12_ops import _mean_recall, _topk_sets

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = _exact_l2_topk(spark, k=5)
    index = train_ann_index(emb, iters=_RES_ITERS)
    q = _queries(emb)
    residual = _mean_recall(
        exact, _topk_sets(ann_index_search(q, index, nprobe=2, k=5))
    )
    refined = _mean_recall(
        exact,
        _topk_sets(
            ann_index_search_refined(
                q, index, emb, nprobe=2, k=5, refine_factor=4
            )
        ),
    )
    assert residual == 0.34
    # mean of ten exact per-query ratios; the division makes the mean
    # itself inexact (0.6399999999999999), so pin to the rounded value
    assert round(refined, 10) == 0.64
    assert refined > residual


def test_refine_subset_of_shortlist_and_exact_order(spark):
    """The refined top-k is drawn from the ADC shortlist (refine never
    invents candidates) and is ordered by exact squared-L2 units
    (strictly non-decreasing within each query, ties to smaller
    vec_id)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    index = train_ann_index(emb, iters=_RES_ITERS)
    q = _queries(emb)
    shortlist = {
        (r.query_id, r.vec_id)
        for r in ann_index_search(q, index, nprobe=2, k=20).collect()
    }
    rows = ann_index_search_refined(
        q, index, emb, nprobe=2, k=5, refine_factor=4
    ).collect()
    assert rows and all((r.query_id, r.vec_id) in shortlist for r in rows)
    by_q: dict = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.exact_units, r.vec_id))
    for seq in by_q.values():
        assert seq == sorted(seq)


def test_ann_index_compaction_physical_and_bitwise(spark, tmp_path):
    """VERDICT r12 item 7's Done condition, physically: the codes table
    accumulates one parquet fragment per append (write base, append
    delta -> >= 2 data files); compact_ann_index rewrites it into
    EXACTLY one file per planned bin with whole cells per bin; and the
    compacted index serves searches bitwise-equal to the un-compacted
    one."""
    import glob as _glob

    from ohlc_spark_streaming_spark.operators.similarity import (
        ann_compaction_plan,
        compact_ann_index,
        encode_into_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.where(F.col("vec_id") % 10 < 8)
    delta = emb.where(F.col("vec_id") % 10 >= 8)
    index = train_ann_index(base, iters=_RES_ITERS)
    d_cells, d_codes = encode_into_index(delta, index)

    frag = str(tmp_path / "codes_frags")
    index["codes"].write.mode("overwrite").parquet(frag)
    d_codes.write.mode("append").parquet(frag)
    frags = _glob.glob(f"{frag}/part-*.parquet")
    assert len(frags) >= 2, frags  # the append really fragmented

    grown = {
        "centroids": index["centroids"],
        "codebook": index["codebook"],
        "cells": index["cells"].unionByName(d_cells),
        "codes": spark.read.parquet(frag),
    }
    compacted = compact_ann_index(
        spark, grown, str(tmp_path / "opt"), target_rows=1024
    )
    plan = {
        r.cell: r.file_bin
        for r in ann_compaction_plan(grown, target_rows=1024).collect()
    }
    n_bins = len(set(plan.values()))
    assert n_bins >= 2, plan  # the plan is not degenerate
    for b in set(plan.values()):
        files = _glob.glob(
            str(tmp_path / "opt" / "codes_compact" / f"file_bin={b}")
            + "/part-*.parquet"
        )
        assert len(files) == 1, (b, files)  # one packed file per bin

    q = _queries(emb)
    pre = sorted(
        map(tuple, ann_index_search(q, grown, nprobe=2, k=5).collect())
    )
    post = sorted(
        map(tuple, ann_index_search(q, compacted, nprobe=2, k=5).collect())
    )
    assert pre == post  # read-equivalence, bitwise


def test_streaming_ann_serve_refined_multibatch_equals_batch(
    spark, tmp_path
):
    """The refined serving-tier pin: a query tape split into THREE real
    micro-batches, served against a frozen residual index WITH the
    exact re-rank (fold_ann_serve_refined), returns row-for-row what
    the batch refined search returns over the same corpus — the
    IndexRefineFlat tier, like the base tier, is arrival-batching
    invariant because every batch re-ranks against the full static
    corpus."""
    import os

    from ohlc_spark_streaming_spark.queries.streaming import (
        fold_ann_serve_refined,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    index = train_ann_index(emb, iters=_RES_ITERS)

    q = emb.where(F.col("vec_id") < 10)
    tape_dir = str(tmp_path / "qtape")
    q.withColumn("part", F.col("vec_id") % 3).repartitionByRange(
        3, "part"
    ).drop("part").write.mode("overwrite").parquet(tape_dir)
    n_files = len(
        [f for f in os.listdir(tape_dir) if f.endswith(".parquet")]
    )
    assert n_files == 3, n_files
    stream = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tape_dir)
    )
    got = set(
        map(
            tuple,
            fold_ann_serve_refined(
                stream, index, emb, nprobe=2, k=5, refine_factor=4
            ).collect(),
        )
    )
    want = set(
        map(
            tuple,
            ann_index_search_refined(
                _queries(emb), index, emb, nprobe=2, k=5, refine_factor=4
            ).collect(),
        )
    )
    assert got == want and len(got) == 50


def test_filtered_search_prefilters_not_postfilters(spark):
    """Filtered ANN pin: (a) every returned candidate's label equals
    its query's label; (b) ranks are dense 1..k per query — the filter
    ran BEFORE the top-k cut (pre-filtering), so the k slots are all
    filter-survivors; (c) the result is NOT the post-hoc filter of the
    unfiltered top-k — post-filtering under-fills whenever an
    unfiltered slot went to a wrong-label neighbor, which is the
    precise mistake the operator exists to avoid."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    index = train_ann_index(emb, iters=_RES_ITERS)
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("_e"),
        F.col("label").alias("_qattr"),
    )
    filt = ann_index_search(
        q, index, nprobe=2, k=5, attrs=emb.select("vec_id", "label")
    ).collect()
    by_q: dict[int, list] = {}
    for r in filt:
        assert labels[r.vec_id] == labels[r.query_id]
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    unfiltered = ann_index_search(_queries(emb), index, nprobe=2, k=5).collect()
    post = {
        (r.query_id, r.vec_id)
        for r in unfiltered
        if labels[r.vec_id] == labels[r.query_id]
    }
    pre = {(r.query_id, r.vec_id) for r in filt}
    # post-filtering keeps only same-label survivors of the unfiltered
    # top-k: a strict subset here (under-filled queries exist)
    assert post < pre


def test_streaming_bpe_encode_multibatch_equals_batch(spark, tmp_path):
    """The frozen-tokenizer pin: the documents table split into THREE
    real micro-batches, encoded per batch by fold_bpe_encode with the
    batch-trained merge table, merges to row-for-row the batch
    bpe_encode_vocab answer — a frozen tokenizer is arrival-batching
    invariant because segmentation is a pure function of (word, rules)
    and the only cross-batch state is the word-frequency ledger."""
    import os

    from ohlc_spark_streaming_spark.operators.bpe import (
        bpe_encode,
        bpe_train_rules,
        word_freqs,
    )
    from ohlc_spark_streaming_spark.queries.bpe_oracles import _BPE_MERGES
    from ohlc_spark_streaming_spark.queries.streaming import fold_bpe_encode

    docs = load_table(spark, SF_SMOKE, "documents")
    rules = bpe_train_rules(docs, _BPE_MERGES)
    tape_dir = str(tmp_path / "doctape")
    docs.withColumn("part", F.col("doc_id") % 3).repartitionByRange(
        3, "part"
    ).drop("part").write.mode("overwrite").parquet(tape_dir)
    n_files = len([f for f in os.listdir(tape_dir) if f.endswith(".parquet")])
    assert n_files == 3, n_files
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tape_dir)
    )
    got = set(map(tuple, fold_bpe_encode(stream, rules).collect()))
    want = set(
        map(
            tuple,
            bpe_encode(word_freqs(docs), rules)
            .select(
                "word",
                F.col("freq").cast("long").alias("freq"),
                F.size("syms").cast("long").alias("n_tokens"),
                F.concat_ws("|", "syms").alias("tokens"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0

"""Round-12 operator pins: residual-encoded IVF-PQ (FAISS IVFADC's
default encoding) and the ANN index lifecycle (train offline → persist →
append deltas → serve frozen)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.functions.vectorops import as_double_array
from ohlc_spark_streaming_spark.operators.similarity import (
    ann_index_search,
    encode_into_index,
    ivf_pq_residual_topk,
    ivf_pq_trained_topk,
    read_ann_index,
    train_ann_index,
    write_ann_index,
)
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE

from ohlc_spark_streaming_spark.queries.ann_oracles import _RES_ITERS


def _topk_sets(df, k=5):
    out: dict = {}
    for r in df.where(F.col("rank") <= k).collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def _mean_recall(exact, approx):
    rs = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    return sum(rs) / len(rs)


def test_residual_recall_beats_trained_raw(spark):
    """VERDICT r11 item 1's Done condition: residual encoding lifts
    recall@5 over trained-raw AT EQUAL COST (same iters, same nprobe),
    and over the registered trained-raw config (iters=2). Everything is
    a deterministic computation on fixed data, so the measured recalls
    are exact: residual(3)=0.34 vs raw(3)=0.26 and raw(2)=0.30 at
    sf0.001 (the registered _RES_ITERS=3 is itself a measured choice —
    residual needs the coarse quantizer settled before the residual
    distribution is worth fitting; at iters=2 residual is 0.24)."""
    from .test_ann_recall import _exact_l2_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = _exact_l2_topk(spark, k=5)
    res = _mean_recall(
        exact,
        _topk_sets(ivf_pq_residual_topk(emb, k=5, iters=_RES_ITERS, nprobe=2)),
    )
    raw_equal = _mean_recall(
        exact,
        _topk_sets(ivf_pq_trained_topk(emb, k=5, iters=_RES_ITERS, nprobe=2)),
    )
    raw_registered = _mean_recall(
        exact, _topk_sets(ivf_pq_trained_topk(emb, k=5, iters=2, nprobe=2))
    )
    assert res >= raw_equal, (res, raw_equal)
    assert res >= raw_registered, (res, raw_registered)
    assert res >= 0.30  # well above the untrained 0.20 and chance 0.01


def test_index_append_equals_rebuild_encode(spark):
    """The two-phase lifecycle pin (VERDICT r11 item 2): encoding the
    appended slice against a FROZEN base-trained index produces exactly
    the rows a from-scratch frozen encode of the full corpus produces
    for that slice — cells and codes table-for-table, and search over
    the grown index equals search over the rebuild-encoded one."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.where(F.col("vec_id") % 10 < 8)
    appended = emb.where(F.col("vec_id") % 10 >= 8)
    assert appended.count() > 0

    index = train_ann_index(base, iters=_RES_ITERS)
    new_cells, new_codes = encode_into_index(appended, index)

    # Rebuild-encode: the FULL corpus against the same frozen tables.
    all_cells, all_codes = encode_into_index(emb, index)
    want_cells = set(
        map(tuple, all_cells.where(F.col("vec_id") % 10 >= 8).collect())
    )
    want_codes = set(
        map(tuple, all_codes.where(F.col("vec_id") % 10 >= 8).collect())
    )
    assert set(map(tuple, new_cells.collect())) == want_cells
    assert set(map(tuple, new_codes.collect())) == want_codes
    # The base slice of the rebuild-encode equals the trained index's own
    # tables (assignment/encoding are deterministic functions).
    assert set(
        map(tuple, all_cells.where(F.col("vec_id") % 10 < 8).collect())
    ) == set(map(tuple, index["cells"].collect()))

    grown = {
        "centroids": index["centroids"],
        "codebook": index["codebook"],
        "cells": index["cells"].unionByName(new_cells),
        "codes": index["codes"].unionByName(new_codes),
    }
    rebuilt = {
        "centroids": index["centroids"],
        "codebook": index["codebook"],
        "cells": all_cells,
        "codes": all_codes,
    }
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("_e"),
    )
    got = set(map(tuple, ann_index_search(q, grown, nprobe=2, k=5).collect()))
    want = set(
        map(tuple, ann_index_search(q, rebuilt, nprobe=2, k=5).collect())
    )
    assert got == want and len(got) > 0


def test_semantic_dedup_matches_brute_force(spark):
    """dedup_semantic_cells semantics vs a Python brute force at
    sf0.001 (VERDICT r11 item 7's Done condition): collect every
    vector's trained-cell assignment, compute all within-cell cosines
    in numpy-free pure Python, apply the greedy lowest-id rule, and
    demand the operator's kept/dropped verdicts match exactly. Also
    pins duplication-invariance: running on the corpus with every
    vector duplicated (id + 10_000) keeps verdicts for the original
    ids unchanged and drops every copy (its original is a lower id at
    cosine 1)."""
    import math

    from ohlc_spark_streaming_spark.operators.similarity import (
        semantic_dedup_cells,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = semantic_dedup_cells(emb, n_cells=8, iters=2, threshold=0.25)
    got = {r.vec_id: (r.cell, r.kept) for r in out.collect()}

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    by_cell: dict = {}
    for vid, (cell, _) in got.items():
        by_cell.setdefault(cell, []).append(vid)
    want_kept = {}
    for cell, ids in by_cell.items():
        for vid in ids:
            want_kept[vid] = not any(
                o < vid and cos(vecs[vid], vecs[o]) >= 0.25 for o in ids
            )
    assert {v: k for v, (_, k) in got.items()} == want_kept
    n_dropped = sum(1 for _, k in got.values() if not k)
    assert 0 < n_dropped < len(got)  # the threshold actually bites

    dup = emb.unionByName(
        emb.withColumn("vec_id", F.col("vec_id") + 10_000)
    )
    out2 = {
        r.vec_id: r.kept
        for r in semantic_dedup_cells(
            dup, n_cells=8, iters=2, threshold=0.25
        ).collect()
    }
    # Copies never survive; original verdicts unchanged (training on the
    # duplicated corpus yields the same centroids: doubled members scale
    # numerator and denominator of every mean equally).
    assert all(not out2[v + 10_000] for v in got)
    assert {v: out2[v] for v in got} == {v: k for v, (_, k) in got.items()}


def test_streaming_ann_serve_multibatch_equals_batch(spark, tmp_path):
    """The serving-tier pin (VERDICT r11 item 8): a query tape split
    into THREE real micro-batches, served against a frozen residual
    index, returns row-for-row what the batch trained search returns
    over the same corpus — per-batch finals against a static index ARE
    the global answer, regardless of arrival batching."""
    import os

    from ohlc_spark_streaming_spark.queries.streaming import fold_ann_serve

    emb = load_table(spark, SF_SMOKE, "embeddings")
    index = train_ann_index(emb, iters=_RES_ITERS)

    q = emb.where(F.col("vec_id") < 10)
    tape_dir = str(tmp_path / "qtape")
    # vec_id % 3 buckets split the 10 queries across 3 files = 3 batches.
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
    got = set(map(tuple, fold_ann_serve(stream, index, nprobe=2, k=5).collect()))
    want = set(
        map(
            tuple,
            ivf_pq_residual_topk(
                emb, k=5, iters=_RES_ITERS, nprobe=2, index=index
            ).collect(),
        )
    )
    assert got == want and len(got) == 50


def test_staleness_audit_shows_retrain_signal(spark):
    """ann_index_staleness vs ann_recall_residual on the same corpus:
    the stale (base-trained, append-grown) index recalls strictly less
    than the retrained index at sf0.001 (0.22 vs 0.34 — deterministic
    computations on fixed data, so the gap is exact). This is the
    retrain-scheduling signal the audit exists to expose; it is an
    empirical property of THIS corpus/split, not a theorem, which is
    why it lives here as a measured pin rather than in the operator's
    contract."""
    from ohlc_spark_streaming_spark.registry import QUERIES

    stale = {
        r.query_id: r.recall
        for r in QUERIES["ann_index_staleness"](spark, SF_SMOKE).collect()
    }
    fresh = {
        r.query_id: r.recall
        for r in QUERIES["ann_recall_residual"](spark, SF_SMOKE).collect()
    }
    assert set(stale) == set(fresh) and len(stale) == 10
    mean_stale = sum(stale.values()) / len(stale)
    mean_fresh = sum(fresh.values()) / len(fresh)
    assert mean_stale < mean_fresh, (mean_stale, mean_fresh)
    assert mean_stale > 0.05  # the stale index still retrieves


def test_cell_balanced_sample_quota_and_selection(spark):
    """sample_cell_balanced semantics vs a Python recompute: per cell
    the output is exactly the ``quota`` lowest (md5(id), id) keys of
    that cell's members (or all of them if fewer), ranks 1..n dense —
    the deterministic selection, not just the counts. Cell assignments
    are taken from the operator's sibling (dedup_semantic_cells runs
    the identical lloyd_train/_coarse_cells chain at iters=2), so the
    recompute checks the sampler against an independently driver-
    checked clustering."""
    import hashlib

    from ohlc_spark_streaming_spark.operators.similarity import (
        cell_balanced_sample,
    )
    from ohlc_spark_streaming_spark.registry import QUERIES

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = [
        (r.vec_id, r.cell, r.cell_rank, r.sample_key)
        for r in cell_balanced_sample(
            emb, n_cells=8, iters=2, quota=32
        ).collect()
    ]
    cells = {
        r.vec_id: r.cell
        for r in QUERIES["dedup_semantic_cells"](spark, SF_SMOKE).collect()
    }
    by_cell: dict = {}
    for vid, cell in cells.items():
        key = hashlib.md5(str(vid).encode()).hexdigest()
        by_cell.setdefault(cell, []).append((key, vid))
    want = set()
    for cell, members in by_cell.items():
        for rk, (key, vid) in enumerate(sorted(members)[:32], start=1):
            want.add((vid, cell, rk, key))
    assert set(got) == want and len(got) > 0
    # Quota binds: no cell exceeds 32, and full cells hit exactly 32.
    per_cell: dict = {}
    for _, cell, _, _ in got:
        per_cell[cell] = per_cell.get(cell, 0) + 1
    assert all(n <= 32 for n in per_cell.values())
    assert {c: min(len(m), 32) for c, m in by_cell.items()} == per_cell


def test_index_persist_roundtrip_bitwise(spark, tmp_path):
    """Parquet persistence is invisible to search: a written+loaded
    index returns row-for-row (adc_units bitwise) what the in-memory
    index returns — train offline / serve frozen is lossless."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    index = train_ann_index(emb, iters=_RES_ITERS)
    write_ann_index(index, str(tmp_path / "annidx"))
    loaded = read_ann_index(spark, str(tmp_path / "annidx"))
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("_e"),
    )
    got = set(map(tuple, ann_index_search(q, loaded, nprobe=2, k=5).collect()))
    want = set(map(tuple, ann_index_search(q, index, nprobe=2, k=5).collect()))
    assert got == want and len(got) == 50

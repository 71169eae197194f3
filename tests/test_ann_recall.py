"""ANN retrieval QUALITY: the oracle proves the LSH/IVF pipelines compute
what they declare; these tests prove what they declare is WORTH computing —
bucketed candidates must recover most of the exact top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.operators.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def _topk_sets(df, k):
    rows = df.where(F.col("rank") <= k).collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_lsh_recall_vs_exact(spark):
    """The synthetic embeddings are near-random (no cluster structure), so
    single-table single-probe hyperplane LSH recall is bounded by the
    per-plane agreement probability (~(1-θ/π)^planes). The tests pin (a)
    recall well above the 1% random-chance floor at a bucket width suited
    to the corpus, and (b) the planes↔recall tradeoff direction — the
    tuning contract the operator documents."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = _topk_sets(cosine_topk(emb, queries, k=5), 5)

    def mean_recall(n_planes):
        approx = _topk_sets(
            lsh_cosine_topk(emb, queries, dim=64, k=5, n_planes=n_planes), 5
        )
        rs = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
        return sum(rs) / len(rs)

    wide, narrow = mean_recall(2), mean_recall(4)
    assert wide >= 0.25, wide  # measured ~0.40; random chance ≈ 0.01
    assert wide >= narrow  # fewer planes → bigger buckets → higher recall


def test_ivf_recall_vs_exact(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    approx_df = ivf_cosine_topk(emb, n_cells=8, n_queries=10, k=5)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = _topk_sets(cosine_topk(emb, queries, k=5), 5)
    approx = _topk_sets(approx_df, 5)
    common = set(exact) & set(approx)
    assert len(common) >= 5  # both sides cover most probe queries
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in common]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.4, (mean_recall, recalls)


def test_pq_adc_recall_and_exactness(spark):
    """PQ-ADC (pq_adc_topk): two pins.

    (a) RECALL vs exact squared-L2 top-5 — ADC approximates L2, so L2
        is the right yardstick (not cosine). The untrained 8x8 codebook
        on near-random vectors measured 0.18 mean recall@5; pin 0.10,
        ~10x the 5/N random-chance floor.
    (b) EXACTNESS on centroid rows — a corpus vector that IS a codebook
        seed (vec_id < 8) encodes with zero quantization error in every
        subspace, so its ADC distance from any query must equal the
        QUANTIZED exact distance sum_s floor(d(q_s, c_s)*1e9 + 0.5).
        This pins the encode -> LUT -> sum path end to end: a wrong
        slice offset, assignment tie-break, or join key would break it.
    """
    from pyspark.sql import Window

    from ohlc_spark_streaming_spark.functions.vectorops import (
        as_double_array,
        sqdist,
    )
    from ohlc_spark_streaming_spark.operators.similarity import pq_adc_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    # Exact L2 brute force over the same 10 probe queries.
    d = emb.select("vec_id", as_double_array("embedding").alias("_v"))
    q = d.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("_v").alias("_q")
    )
    pairs = d.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "vec_id", sqdist(F.col("_v"), F.col("_q")).alias("d2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    exact_top = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 5
    )
    exact = _topk_sets(exact_top, 5)
    approx = _topk_sets(pq_adc_topk(emb, k=5), 5)
    rs = [len(exact[qi] & approx.get(qi, set())) / len(exact[qi]) for qi in exact]
    assert sum(rs) / len(rs) >= 0.10, rs  # measured 0.18; chance ~0.01

    # (b) centroid rows: ADC == quantized exact. Recompute ADC without
    # the top-k cut (k = corpus size) and join against the per-subspace
    # quantized exact sum.
    n = emb.count()
    adc_all = pq_adc_topk(emb, k=n).where(F.col("vec_id") < 8)
    sub_exact = (
        d.where(F.col("vec_id") < 8)
        .crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            sum(
                [
                    F.floor(
                        sqdist(
                            F.slice(F.col("_v"), s * 8 + 1, 8),
                            F.slice(F.col("_q"), s * 8 + 1, 8),
                        )
                        * 1e9
                        + F.lit(0.5)
                    ).cast("long")
                    for s in range(8)
                ],
                F.lit(0).cast("long"),
            ).alias("want_units"),
        )
    )
    cmp = adc_all.join(sub_exact, ["query_id", "vec_id"])
    assert cmp.count() == sub_exact.count()
    bad = cmp.where(F.col("adc_units") != F.col("want_units")).count()
    assert bad == 0


def test_ivfpq_composition_and_recall(spark):
    """IVF-PQ (ivf_pq_topk): two pins.

    (a) COMPOSITION EXACTNESS — the composite must equal pq_adc_topk
        restricted to candidates sharing the query's coarse cell,
        re-ranked: coarse pruning and fine ranking compose with no
        interaction term. A wrong cell key, a LUT joined on the wrong
        side, or a dropped candidate breaks the equality.
    (b) RECALL vs exact squared-L2 top-5: measured 0.20 on the
        near-random corpus (untrained codebooks, nprobe=1); pin 0.08,
        ~8x the random-chance floor.
    """
    from pyspark.sql import Window

    from ohlc_spark_streaming_spark.functions.vectorops import (
        as_double_array,
        sqdist,
    )
    from ohlc_spark_streaming_spark.operators.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    composite = ivf_pq_topk(emb, k=5)

    # Rebuild the reference: full-corpus ADC ranking, filtered to the
    # query's cell, re-ranked per query.
    d = emb.select("vec_id", as_double_array("embedding").alias("_v"))
    cents = d.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("_cid"), F.col("_v").alias("_cv")
    )
    cells = (
        d.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "_cid",
            sqdist(F.col("_v"), F.col("_cv")).alias("_d"),
        )
        .groupBy("vec_id")
        .agg(
            F.min(F.struct(F.col("_d").alias("d"), F.col("_cid").alias("c")))
            .getField("c")
            .alias("cell")
        )
    )
    full_adc = pq_adc_topk(emb, k=n).drop("rank")
    qcells = cells.select(
        F.col("vec_id").alias("query_id"), F.col("cell").alias("qcell")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_units").asc(), F.col("vec_id").asc()
    )
    want = (
        full_adc.join(cells, "vec_id")
        .join(qcells, "query_id")
        .where(F.col("cell") == F.col("qcell"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("query_id", "vec_id", "adc_units", "rank")
    )
    got_rows = set(map(tuple, composite.collect()))
    want_rows = set(map(tuple, want.collect()))
    assert got_rows == want_rows

    # (b) recall floor vs exact L2.
    q = d.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("_v").alias("_q")
    )
    scored = (
        d.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", sqdist(F.col("_v"), F.col("_q")).alias("d2")
        )
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    exact = _topk_sets(
        scored.withColumn("rank", F.row_number().over(we)).where(
            F.col("rank") <= 5
        ),
        5,
    )
    approx = _topk_sets(composite, 5)
    rs = [len(exact[qi] & approx.get(qi, set())) / len(exact[qi]) for qi in exact]
    assert sum(rs) / len(rs) >= 0.08, rs

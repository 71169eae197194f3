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


def _exact_l2_topk(spark, k=5):
    """Exact squared-L2 top-k for the 10 probe queries (the ADC-family
    yardstick: ADC approximates L2, so L2 is what recall measures
    against)."""
    from pyspark.sql import Window

    from ohlc_spark_streaming_spark.functions.vectorops import (
        as_double_array,
        sqdist,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = emb.select("vec_id", as_double_array("embedding").alias("_v"))
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
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    return _topk_sets(
        scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        ),
        k,
    )


def _mean_recall(exact, approx):
    rs = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    return sum(rs) / len(rs)


def test_trained_ivfpq_recall_curve(spark):
    """The VERDICT-r10 frontier pins: training and multi-probe LIFT
    retrieval quality, on the same deterministic corpus (everything
    here is a fixed computation on fixed data — the measured recalls
    are exact, not sampled, so the inequalities pin real structure).

    (a) TRAINED >= TRAINING-FREE at equal search cost (nprobe=1):
        two Lloyd iterations on both quantizers lift recall@5 from
        0.20 to 0.28 at sf0.001.
    (b) nprobe tradeoff, end-to-end: recall(nprobe=2) >= recall(np=1)
        (0.30 vs 0.28 measured).
    (c) nprobe tradeoff, retrieval layer: the fraction of exact-top-5
        neighbors INSIDE the probed candidate set is monotone in
        nprobe 1 -> 2 -> 3 — guaranteed by construction (each probe
        adds cells, never removes), so this pin is displacement-proof
        where (b) could in principle wobble when an ADC-better /
        L2-worse candidate enters with the extra cell.
    """
    from ohlc_spark_streaming_spark.functions.vectorops import as_double_array
    from ohlc_spark_streaming_spark.operators.similarity import (
        _coarse_cells,
        ivf_pq_topk,
        ivf_pq_trained_topk,
        lloyd_train,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = _exact_l2_topk(spark, k=5)

    untrained = _mean_recall(exact, _topk_sets(ivf_pq_topk(emb, k=5), 5))
    trained_np = {
        np: _mean_recall(
            exact,
            _topk_sets(ivf_pq_trained_topk(emb, k=5, iters=2, nprobe=np), 5),
        )
        for np in (1, 2)
    }
    # (a) training lifts recall at equal cost; both clear the 0.01
    # random-chance floor by >10x.
    assert trained_np[1] >= untrained, (trained_np, untrained)
    assert untrained >= 0.10
    # (b) more probes never measured worse end-to-end here.
    assert trained_np[2] >= trained_np[1], trained_np

    # (c) candidate coverage is monotone in nprobe by construction.
    d = emb.select("vec_id", as_double_array("embedding").alias("_e"))
    coarse = lloyd_train(d, "vec_id", "_e", 8, 2)
    cells = _coarse_cells(d, "vec_id", 8, vec_alias="_e", cents=coarse).drop(
        "probe"
    )

    def coverage(np):
        qcells = _coarse_cells(
            d.where(F.col("vec_id") < 10),
            "vec_id",
            8,
            vec_alias="_e",
            cents=coarse,
            nprobe=np,
        ).select(F.col("vec_id").alias("query_id"), "cell")
        cand = {}
        for r in qcells.join(cells, "cell").collect():
            if r.vec_id != r.query_id:
                cand.setdefault(r.query_id, set()).add(r.vec_id)
        return _mean_recall(exact, cand)

    c1, c2, c3 = coverage(1), coverage(2), coverage(3)
    assert c1 <= c2 <= c3, (c1, c2, c3)
    # end-to-end recall is bounded by what the probes cover.
    assert trained_np[2] <= c2


def test_lloyd_distortion_descent_and_degeneration(spark):
    """(a) Lloyd's monotonic-descent guarantee, observed: mean
    quantization distortion (squared-L2 to the assigned centroid)
    never increases over iterations 0 (seeds) -> 1 -> 2, for BOTH the
    coarse quantizer and the per-subspace PQ codebooks (the 1e-12
    integer-unit mean quantization perturbs each component by <= 5e-13
    — orders below the per-step descent).
    (b) DEGENERATION: ivf_pq_trained_topk with iters=0, nprobe=1 must
    equal ivf_pq_topk row-for-row — the trained path IS the shared
    machinery with trained inputs, not a second implementation."""
    from ohlc_spark_streaming_spark.functions.vectorops import (
        as_double_array,
        sqdist,
    )
    from ohlc_spark_streaming_spark.operators.similarity import (
        _explode_subs,
        ivf_pq_topk,
        ivf_pq_trained_topk,
        lloyd_train,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = emb.select("vec_id", as_double_array("embedding").alias("_e"))
    subs = _explode_subs(d, "vec_id", "_sv", 8, 8)

    def distortion(vecs, vec_alias, part_cols, iters):
        cents = lloyd_train(vecs, "vec_id", vec_alias, 8, iters, part_cols)
        joined = (
            vecs.join(F.broadcast(cents), list(part_cols))
            if part_cols
            else vecs.crossJoin(F.broadcast(cents))
        )
        return (
            joined.select(
                *part_cols,
                "vec_id",
                sqdist(F.col(vec_alias), F.col("_cv")).alias("_d"),
            )
            .groupBy(*part_cols, "vec_id")
            .agg(F.min("_d").alias("best"))
            .agg(F.avg("best"))
            .collect()[0][0]
        )

    coarse = [distortion(d, "_e", (), i) for i in (0, 1, 2)]
    assert coarse[0] >= coarse[1] >= coarse[2], coarse
    assert coarse[2] < coarse[0], coarse  # training actually moved
    sub = [distortion(subs, "_sv", ("s",), i) for i in (0, 1, 2)]
    assert sub[0] >= sub[1] >= sub[2], sub
    assert sub[2] < sub[0], sub

    got = set(
        map(tuple, ivf_pq_trained_topk(emb, k=5, iters=0, nprobe=1).collect())
    )
    want = set(map(tuple, ivf_pq_topk(emb, k=5).collect()))
    assert got == want


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
        _coarse_cells,
        ivf_pq_topk,
        pq_adc_topk,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    composite = ivf_pq_topk(emb, k=5)

    # Rebuild the reference: full-corpus ADC ranking, filtered to the
    # query's cell, re-ranked per query. The cell assignment uses the
    # SHARED _coarse_cells definition (round-10 ADVICE) so the pin
    # checks the composition, not a second copy of the assignment.
    d = emb.select("vec_id", as_double_array("embedding").alias("_v"))
    cells = _coarse_cells(d, "vec_id", 8).drop("probe")
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


def test_kmeanspar_seeding_distortion(spark):
    """VERDICT r12 item 3's Done condition: k-means|| seeding
    (kmeanspar_seeds at the registered config) beats first-k seeding on
    quantization distortion AT THE SEED LEVEL — before any corpus-wide
    Lloyd pass — and converges to the same plateau after training.
    Deterministic computation on fixed data, so the units are exact
    (sf0.001): seeds 631.9e9 vs first-k's 810.7e9 (-22%); after the
    registered 2 Lloyd iterations both sit on the plateau within 0.5%
    (the structure-free corpus has no bad local minima — the ||-init's
    value at scale is fewer full-corpus passes to reach it)."""
    from ohlc_spark_streaming_spark.functions.vectorops import (
        as_double_array,
    )
    from ohlc_spark_streaming_spark.operators.similarity import (
        kmeanspar_seeds,
        lloyd_train,
        quantization_distortion,
    )
    from ohlc_spark_streaming_spark.queries.ann_oracles import (
        _KMPAR_ELL,
        _KMPAR_ROUNDS,
        _KMPAR_T,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = emb.select("vec_id", as_double_array("embedding").alias("_e"))
    seeds = kmeanspar_seeds(
        d,
        "vec_id",
        "_e",
        8,
        rounds=_KMPAR_ROUNDS,
        oversample=_KMPAR_ELL,
        t_reduce=_KMPAR_T,
    )
    assert seeds.count() == 8

    def du(it, sds):
        cents = lloyd_train(d, "vec_id", "_e", 8, it, seeds=sds)
        return quantization_distortion(d, cents).collect()[0][0]

    fk0, kp0 = du(0, None), du(0, seeds)
    assert kp0 < fk0, (kp0, fk0)  # the seeding lift
    assert (fk0 - kp0) / fk0 > 0.15, (kp0, fk0)  # and it is material
    fk2, kp2 = du(2, None), du(2, seeds)
    assert abs(kp2 - fk2) / fk2 < 0.02, (kp2, fk2)  # shared plateau
    assert kp2 < kp0 and fk2 < fk0  # training descends from both inits


def test_opq_rotation_has_no_headroom_here(spark):
    """Pin WHY the round-13 stretch (OPQ rotation, Ge et al. CVPR 2012)
    is skipped as measured-not-guessed: OPQ's parametric solution
    balances per-subspace variance products, so its headroom is bounded
    by the spread of per-dimension variances — and this corpus's spread
    is ~1.3x (max/min), i.e. the dimensions are already near-isotropic
    and every rotation/allocation leaves the PQ error essentially
    unchanged. (Contrast: the refine re-rank, which attacks in-shortlist
    quantization error directly, lifted recall@5 0.34 -> 0.72.) If a
    future corpus shows a materially larger spread, this pin fails and
    OPQ goes back on the table."""
    from ohlc_spark_streaming_spark.functions.vectorops import (
        as_double_array,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    comp = emb.select(
        F.posexplode(as_double_array("embedding")).alias("_p", "x")
    )
    v = (
        comp.groupBy("_p")
        .agg(F.var_pop("x").alias("v"))
        .agg(F.max("v").alias("hi"), F.min("v").alias("lo"))
        .collect()[0]
    )
    assert v.hi / v.lo < 1.5, (v.hi, v.lo)

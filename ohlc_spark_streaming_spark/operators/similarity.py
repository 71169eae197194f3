"""Similarity search over embedding columns (SURVEY.md §2.11).

* :func:`cosine_topk` — exact brute force: broadcast the (bounded) query
  set against the corpus, sequential-fold cosine, per-query top-k via
  row_number. O(N·Q·D) but embarrassingly parallel and shuffle-free until
  the final per-query top-k (which is partial-aggregated per partition).
* :func:`lsh_cosine_topk` — random-hyperplane LSH: each vector gets a
  sign-bucket from ``n_planes`` fixed ±1 hyperplanes; candidates are
  corpus vectors sharing the query's bucket; exact cosine re-ranks the
  candidates. At 100 TB the bucket equi-join replaces the cross join —
  cost drops to O(N·planes·D) hashing + per-bucket work.

The hyperplanes are deterministic ±1 vectors generated from a fixed LCG
seed in Python and inlined as literals into BOTH the Spark plan and the
DuckDB oracle SQL, so even the approximate path is value-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectorops import as_double_array, cosine, dot

N_PLANES = 8
_LCG_M = 2**31
_LCG_A = 1103515245
_LCG_C = 12345


def hyperplanes(dim: int, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from a fixed LCG (shared with oracle)."""
    state = 20240101
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (_LCG_A * state + _LCG_C) % _LCG_M
            row.append(1.0 if (state >> 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id: bit j set iff plane_j · v > 0."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(w) for w in plane])
        d = dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, plane_lit)
        bucket = bucket + F.when(d > 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket.cast("long")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded when
    ids collide). Output: query_id, vec_id, cos_sim, rank."""
    c = corpus.select(
        F.col(id_col), as_double_array(vec_col).alias("_v")
    )
    q = queries.select(
        F.col(query_id_col), as_double_array(vec_col).alias("_q")
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col(query_id_col))
    scored = pairs.select(
        query_id_col,
        id_col,
        cosine(F.col("_v"), F.col("_q")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k: exact cosine re-ranking within the query's LSH
    bucket. Recall is tunable via n_planes (fewer planes → bigger buckets).

    Output: query_id, vec_id, cos_sim, rank — deterministic because the
    planes are fixed literals and ties break on vec_id.
    """
    planes = hyperplanes(dim, n_planes)
    c = corpus.select(F.col(id_col), as_double_array(vec_col).alias("_v")).withColumn(
        "bucket", _bucket_expr("_v", planes)
    )
    q = queries.select(
        F.col(query_id_col), as_double_array(vec_col).alias("_q")
    ).withColumn("bucket", _bucket_expr("_q", planes))

    pairs = c.join(F.broadcast(q), "bucket").where(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = pairs.select(
        query_id_col, id_col, cosine(F.col("_v"), F.col("_q")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.99,
) -> DataFrame:
    """Near-duplicate vector pairs by cosine ≥ threshold, blocked to keep
    the pair space bounded (block membership is part of the semantics).

    Duplication-invariant (round 4 — SCALE.md caught the unguarded
    version at 101x on the 10x-duplication corpus): identical vectors
    collapse to ONE representative per (block, vector) before the
    pairwise join, so k copies of a vector cost one cosine, not k² —
    the same distinct-content collapse as operators/dedup.py
    ``_set_groups``. Representative pairs expand back to id pairs by an
    output-bound members join; expanded pairs inherit the rep cosine
    bitwise (identical arrays ⇒ identical fold), and within-group pairs
    carry ``cosine(v, v)`` computed once per group — the exact
    expression value, never a ``lit(1.0)`` shortcut the oracle would
    disagree with in the last ulp."""
    blk = [block_col] if block_col else []
    base = embeddings.select(
        F.col(id_col),
        *[F.col(c) for c in blk],
        as_double_array(vec_col).alias("_v"),
    )
    groups = (
        base.groupBy(*blk, "_v")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_members"))
        .withColumn("_rep", F.col("_members")[0])
    )

    a = groups.select(
        *[F.col(c).alias(f"_blk_{c}") for c in blk],
        F.col("_rep").alias("_rep_a"),
        F.col("_v").alias("_va"),
        F.col("_members").alias("_ma"),
    )
    b = groups.select(
        *[F.col(c).alias(f"_blk_{c}") for c in blk],
        F.col("_rep").alias("_rep_b"),
        F.col("_v").alias("_vb"),
        F.col("_members").alias("_mb"),
    )
    joined = (
        a.join(b, [f"_blk_{c}" for c in blk])
        if block_col
        else a.crossJoin(b)
    )
    cross = (
        joined.where(F.col("_rep_a") < F.col("_rep_b"))
        .select(
            "_ma", "_mb", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= threshold)
        .select(F.explode("_ma").alias("_ia"), "_mb", "cos_sim")
        .select("_ia", F.explode("_mb").alias("_ib"), "cos_sim")
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "cos_sim",
        )
    )
    within = (
        groups.where(F.size("_members") >= 2)
        .select(
            "_members",
            cosine(F.col("_v"), F.col("_v")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .select(F.posexplode("_members").alias("_i", "_ia"), "_members", "cos_sim")
        .select(
            F.col("_ia").alias("id_a"),
            F.explode(
                F.slice(F.col("_members"), F.col("_i") + 2, F.size("_members"))
            ).alias("id_b"),
            "cos_sim",
        )
    )
    return cross.unionByName(within)


def ivf_cosine_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """IVF-style ANN: coarse quantization into inverted lists + exact
    re-rank inside the probed cell (nprobe=1).

    The coarse centroids are the first ``n_cells`` corpus vectors (a
    deterministic, training-free quantizer — a real deployment swaps in
    k-means centroids; every downstream step is unchanged). Assignment is
    argmin squared-L2 with ties broken by centroid id, computed
    relationally: corpus x broadcast(centroids) -> struct-min. At 100 TB
    the cell equi-join replaces the brute-force cross join exactly like
    the hyperplane-LSH path, but with data-adaptive cells.

    Output: query_id, vec_id, cos_sim, rank (deterministic).
    """
    from ..functions.vectorops import sqdist

    emb = corpus.select(F.col(id_col), as_double_array(vec_col).alias("_v"))
    cents = emb.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("_cid"), F.col("_v").alias("_cv")
    )
    dists = emb.crossJoin(F.broadcast(cents)).select(
        id_col,
        "_cid",
        sqdist(F.col("_v"), F.col("_cv")).alias("_d"),
    )
    cells = dists.groupBy(id_col).agg(
        F.min(F.struct(F.col("_d").alias("d"), F.col("_cid").alias("c")))
        .getField("c")
        .alias("cell")
    )
    assigned = emb.join(cells, id_col)
    q = assigned.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_q"), "cell"
    )
    pairs = assigned.join(F.broadcast(q), "cell").where(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", id_col, cosine(F.col("_v"), F.col("_q")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "cos_sim", "rank")
    )


def _pq_codes_lut(
    d: DataFrame,
    id_col: str,
    dim: int,
    n_subspaces: int,
    n_cents: int,
    n_queries: int,
):
    """The shared PQ fine half: (codes, lut) from the training-free
    subspace codebook — ONE definition of the struct-min assignment
    tie-break and the floor(d·1e9 + 0.5) LUT quantization, so the
    standalone ADC scan (pq_adc_topk) and the IVF-PQ composite
    (ivf_pq_topk) cannot drift apart (the composition-exactness test
    relies on them agreeing bitwise). ``d`` is (id_col, _e: array<double>).
    codes: (id, s, c); lut: (query_id, s, c, _du integer units)."""
    from ..functions.vectorops import sqdist

    sub_d = dim // n_subspaces

    def _explode_subs(frame, out_col):
        return frame.select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.slice(F.col("_e"), s * sub_d + 1, sub_d).alias(
                                out_col
                            ),
                        )
                        for s in range(n_subspaces)
                    ]
                )
            ).alias("_x"),
        ).select(id_col, F.col("_x.s").alias("s"), f"_x.{out_col}")

    sub = _explode_subs(d, "sv")
    cents = _explode_subs(
        d.where(F.col(id_col) < n_cents), "cv"
    ).withColumnRenamed(id_col, "_cid")
    dists = sub.join(F.broadcast(cents), "s").select(
        id_col, "s", "_cid", sqdist(F.col("sv"), F.col("cv")).alias("_d")
    )
    codes = dists.groupBy(id_col, "s").agg(
        F.min(F.struct(F.col("_d").alias("d"), F.col("_cid").alias("c")))
        .getField("c")
        .alias("c")
    )
    lut = dists.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        "s",
        F.col("_cid").alias("c"),
        F.floor(F.col("_d") * 1e9 + F.lit(0.5)).cast("long").alias("_du"),
    )
    return codes, lut


def pq_adc_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_subspaces: int = 8,
    n_cents: int = 8,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Product-quantization ANN search with Asymmetric Distance
    Computation (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011) — the compressed-index scale path
    that IVF (coarse cells) and LSH (hyperplane buckets) don't cover:

    * **Encode** (index build): each vector splits into ``n_subspaces``
      contiguous subvectors; each snaps to its nearest of ``n_cents``
      seed centroids (argmin L2, ties to the smallest centroid id via
      the struct-min discipline — the identical assignment
      q_embedding_pq_audit audits). The corpus is then represented by
      ``n_subspaces`` small codes per vector — at 100 TB this is the
      point: an 8-byte code row instead of a 256-byte float vector,
      so the scan that ranks a billion vectors reads 3% of the bytes.
    * **Search** (ADC): each query keeps its EXACT subvectors and
      precomputes a (subspace × centroid) lookup table of squared-L2
      distances — ``n_queries × n_subspaces × n_cents`` rows, a
      broadcast. Approximate distance(query, vec) = Σ_s LUT[s][code_s]
      — one equi-join on (subspace, centroid) + one partial-aggregated
      sum, never a D-dimensional fold per pair.

    Determinism: each LUT entry is quantized to integer 1e-9 units
    (``floor(d·1e9 + 0.5)`` — the operators/graph.py rule) BEFORE the
    per-pair sum, so the 8-way addition is exact integer math and
    order-independent (a double sum would be shuffle-order-dependent
    in the last ulp). Output: query_id, vec_id, adc_units (ascending =
    nearer), rank; ties break on vec_id.

    Codebook is training-free (subvectors of the first ``n_cents``
    corpus vectors — kmeans_update_step holds the training step); a
    real deployment swaps in trained centroids, every downstream step
    unchanged."""
    d = corpus.select(F.col(id_col), as_double_array(vec_col).alias("_e"))
    codes, lut = _pq_codes_lut(d, id_col, dim, n_subspaces, n_cents, n_queries)
    adc = (
        codes.join(F.broadcast(lut), ["s", "c"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum("_du").cast("long").alias("adc_units"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_units").asc(), F.col(id_col).asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "adc_units", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_subspaces: int = 8,
    n_cents: int = 8,
    n_cells: int = 8,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """IVF-PQ composite ANN — the production retrieval shape (FAISS
    "IVFADC", Jégou et al. 2011): coarse quantization prunes the
    CANDIDATE SET (only the probed cell's inverted list is read,
    nprobe=1 — the :func:`ivf_cosine_topk` half) and product
    quantization compresses the CANDIDATES (8 codes per vector ranked
    by an ADC lookup-table sum, never a D-dim fold — the
    :func:`pq_adc_topk` half). At 100 TB the two multiply: the scan
    reads ~1/n_cells of the corpus at ~3% of the bytes.

    Composition is by construction: cells from full-vector argmin L2
    (ties to smallest centroid id), codes/LUT from the shared 8×8
    subspace codebook, candidates = the query's cell minus self, ADC
    in exact integer 1e-9 units (order-independent sum). Output:
    query_id, vec_id, adc_units, rank — ties on vec_id."""
    from ..functions.vectorops import sqdist

    d = corpus.select(F.col(id_col), as_double_array(vec_col).alias("_e"))

    # --- coarse half: full-vector cell assignment (ivf_cosine_topk) ---
    cents_full = d.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("_ccid"), F.col("_e").alias("_cv")
    )
    cell_dists = d.crossJoin(F.broadcast(cents_full)).select(
        id_col, "_ccid", sqdist(F.col("_e"), F.col("_cv")).alias("_d")
    )
    cells = cell_dists.groupBy(id_col).agg(
        F.min(F.struct(F.col("_d").alias("d"), F.col("_ccid").alias("c")))
        .getField("c")
        .alias("cell")
    )

    # --- fine half: the SHARED PQ codes + query LUT, cell-tagged ---
    pq_codes, pq_lut = _pq_codes_lut(
        d, id_col, dim, n_subspaces, n_cents, n_queries
    )
    codes = pq_codes.join(cells, id_col)
    lut = pq_lut.join(
        cells.select(F.col(id_col).alias("query_id"), F.col("cell")),
        "query_id",
    )

    # --- compose: ADC only over the probed cell's inverted list ---
    adc = (
        codes.join(F.broadcast(lut), ["cell", "s", "c"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum("_du").cast("long").alias("adc_units"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_units").asc(), F.col(id_col).asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "adc_units", "rank")
    )


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Arrow-vectorized brute-force cosine top-k: the numpy-kernel variant
    of :func:`cosine_topk` for throughput-bound scoring.

    The query matrix is broadcast once per executor (Python worker reuse);
    each Arrow batch of corpus vectors scores against ALL queries with one
    BLAS matmul instead of per-pair fold expressions — the way a real
    100 TB scorer runs. Float summation order differs from the sequential
    fold, so ranks are stable but low-order score bits may differ: this
    variant is validated by rank-parity against the exact operator, not by
    the bitwise oracle (see tests/test_similarity_vectorized.py).
    """
    import pandas as pd

    spark = corpus.sparkSession
    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = [list(map(float, r[1])) for r in q_rows]
    b_q = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = f"{query_id_col} long, {id_col} long, cos_sim double"

    def score(batches):
        import numpy as np

        ids, mat = b_q.value
        qm = np.asarray(mat, dtype=np.float64)
        qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        for pdf in batches:
            vids = pdf[id_col].to_numpy()
            cm = np.asarray([list(map(float, v)) for v in pdf[vec_col]], dtype=np.float64)
            cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cn @ qn.T  # (batch, n_queries)
            n_b, n_q = sims.shape
            yield pd.DataFrame(
                {
                    query_id_col: list(ids) * n_b,
                    id_col: vids.repeat(n_q),
                    "cos_sim": sims.ravel(),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    scored = scored.where(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )

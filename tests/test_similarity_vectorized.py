"""The Arrow-vectorized cosine scorer must agree with the exact
fold-expression operator on ranks (scores may differ in low-order bits —
different float summation order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_vectorized,
)
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_CORRECTNESS


def test_vectorized_matches_exact_ranks(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.rank): (r.vec_id, r.cos_sim)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    fast = {
        (r.query_id, r.rank): (r.vec_id, r.cos_sim)
        for r in cosine_topk_vectorized(emb, queries, k=10).collect()
    }
    assert exact.keys() == fast.keys()
    for key, (vid, sim) in exact.items():
        fvid, fsim = fast[key]
        assert fvid == vid, (key, vid, fvid)
        assert abs(fsim - sim) < 1e-9

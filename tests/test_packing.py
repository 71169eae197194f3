"""Sequence-packing invariants: the segments must tile both every document
and every chunk exactly (no gaps, no overlaps), independent of partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.operators.packing import pack_sequences
from ohlc_spark_streaming_spark.functions.textops import tokens
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE

CAP = 64


def test_segments_tile_documents_and_chunks(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    seg = pack_sequences(docs, capacity=CAP).cache()

    # Every document's segments cover exactly [0, n_tokens), in order.
    doc_cover = seg.groupBy("doc_id").agg(
        F.sum("seg_len").alias("covered"),
        F.min("doc_tok_start").alias("first_start"),
    )
    n_tok = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    bad_docs = (
        doc_cover.join(n_tok, "doc_id")
        .where((F.col("covered") != F.col("n_tokens")) | (F.col("first_start") != 0))
        .count()
    )
    assert bad_docs == 0

    # Every chunk except the last is exactly full; the last may be partial.
    chunk_fill = seg.groupBy("chunk_id").agg(F.sum("seg_len").alias("fill"))
    last_chunk = chunk_fill.agg(F.max("chunk_id")).collect()[0][0]
    not_full = chunk_fill.where(
        (F.col("chunk_id") != last_chunk) & (F.col("fill") != CAP)
    ).count()
    assert not_full == 0

    # Segments inside a chunk tile it: min start 0 and total == max end.
    chunk_tile = seg.groupBy("chunk_id").agg(
        F.min("chunk_tok_start").alias("lo"),
        F.max(F.col("chunk_tok_start") + F.col("seg_len")).alias("hi"),
        F.sum("seg_len").alias("fill"),
    )
    gaps = chunk_tile.where(
        (F.col("lo") != 0) | (F.col("hi") != F.col("fill"))
    ).count()
    assert gaps == 0


def test_packing_is_partitioning_invariant(spark):
    """The two-phase prefix sum must give identical placement whatever the
    input partitioning is."""
    docs = load_table(spark, SF_SMOKE, "documents")
    a = sorted(map(tuple, pack_sequences(docs, capacity=CAP).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(17), capacity=CAP).collect())
    )
    assert a == b

"""Sequence packing for LLM pretraining pipelines (SURVEY.md §2.11).

Concatenate-then-chunk packing: lay every document's tokens end-to-end in
a deterministic global order and cut the stream into fixed-capacity
context windows. A document that straddles a boundary is split (the
standard GPT-style pretraining layout); the operator emits one row per
(document, chunk) overlap segment, which is exactly the index a packed-
dataset writer needs.

The only global state is the running token offset. Computed scalably as a
TWO-PHASE cumulative sum — not a single-partition window:

1. range-partition by the order column,
2. per-partition prefix sums (window inside each partition, parallel),
3. per-partition totals (one tiny row each) prefix-summed on the driver-
   side-sized table and broadcast back as offsets.

The result is independent of the partition boundaries, so the sampled
range partitioner does not affect determinism. Reference scope: the
reference has no packing operator (its surface is OHLC aggregation,
`/root/reference/main.py:119-188`); this is a north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textops import tokens


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 256,
) -> DataFrame:
    """Pack whitespace tokens into ``capacity``-sized chunks in ``id_col``
    order. Returns one row per (doc, chunk) segment:

    ``doc_id, chunk_id, doc_tok_start, chunk_tok_start, seg_len`` — the
    segment covers tokens ``[doc_tok_start, doc_tok_start+seg_len)`` of
    the document and lands at ``chunk_tok_start`` inside the chunk.
    Empty-token documents are dropped (they occupy no stream positions).
    """
    cap = F.lit(int(capacity)).cast("long")
    t = docs.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)

    # Phase 1+2: local prefix sums within range partitions.
    t = t.repartitionByRange(F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = Window.partitionBy("_pid").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = t.withColumn("_local", F.coalesce(F.sum("n_tokens").over(local), F.lit(0)))

    # Phase 3: per-partition totals → exclusive prefix offsets. One row per
    # partition, so the single-partition window here is O(#partitions).
    totals = t.groupBy("_pid").agg(F.sum("n_tokens").alias("_tot"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(off_w), F.lit(0))
    ).select("_pid", "_off")

    start = (F.col("_off") + F.col("_local")).alias("_start")
    placed = t.join(F.broadcast(offsets), "_pid").select(
        id_col, "n_tokens", start
    )
    end = F.col("_start") + F.col("n_tokens")
    chunk_ids = F.sequence(
        F.floor(F.col("_start") / cap), F.floor((end - 1) / cap)
    )
    seg = placed.select(
        id_col,
        "n_tokens",
        "_start",
        F.explode(chunk_ids).alias("chunk_id"),
    )
    seg_start = F.greatest(F.col("chunk_id") * cap, F.col("_start"))
    seg_end = F.least((F.col("chunk_id") + 1) * cap, F.col("_start") + F.col("n_tokens"))
    return seg.select(
        id_col,
        "chunk_id",
        (seg_start - F.col("_start")).alias("doc_tok_start"),
        (seg_start - F.col("chunk_id") * cap).alias("chunk_tok_start"),
        (seg_end - seg_start).alias("seg_len"),
    )

"""File sinks: parquet writers, batch and streaming.

The reference writes only to Kafka (/root/reference/main.py:208-217); the
parquet sink is the batch/lakehouse twin the driver testdata implies. The
scale-relevant decisions live here:

* **Partition columns** are low-cardinality routing keys (symbol, date) —
  the read-side twin of the Kafka sink's per-row topic routing: partition
  pruning on read plays the role topic subscription plays on the wire.
* **File sizing**: ``coalesce``/``repartition`` before write controls file
  count; we repartition BY the partition columns so each output directory
  is written by as few tasks as possible (avoids the
  tasks x partitions small-file explosion).
* Streaming: append-mode parquet sink with checkpointed exactly-once file
  commits (Spark's file sink maintains a transaction log).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    target_files_per_partition: int = 1,
) -> None:
    """Batch parquet write with small-file discipline.

    With ``partition_by``, rows are first shuffled by the partition columns
    so each Hive-style output directory receives data from
    ``target_files_per_partition`` tasks instead of every task — the
    difference between O(dirs) and O(tasks x dirs) files at scale.
    """
    from pyspark.sql import functions as F

    writer_df = df
    if partition_by:
        part_cols = [df[c] for c in partition_by]
        k = max(1, int(target_files_per_partition))
        if k == 1:
            writer_df = df.repartition(*part_cols)
        else:
            # Deterministic salt (hash of the full row, never rand(): task
            # retries must re-land rows on the same writer) widens each
            # partition directory to ~k writing tasks → ~k files.
            salt = F.pmod(F.hash(*[df[c] for c in df.columns]), F.lit(k))
            writer_df = df.repartition(*part_cols, salt)
    writer = writer_df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def parquet_stream_writer(
    df: DataFrame,
    path: str,
    checkpoint_location: str,
    query_name: str = "parquet_sink",
    partition_by: Sequence[str] = (),
):
    """Streaming parquet writer (append-only — the file sink's commit log
    gives exactly-once file visibility). Caller starts it."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_location)
        .queryName(query_name)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer


def compact_parquet(
    spark, path: str, target_files: int = 1, partition_by: Sequence[str] = ()
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (per partition dir when ``partition_by`` set).

    Streaming sinks and incremental batch appends accumulate small files;
    scan cost at 100 TB is dominated by file-open overhead once files drop
    below ~100 MB. Rewrite-and-swap: the compacted copy is written beside
    the original, then atomically moved into place (directory rename).
    Returns the number of files after compaction.
    """
    import glob
    import os
    import shutil

    tmp = f"{path}.__compact__"
    df = spark.read.parquet(path)
    writer_df = (
        df.repartition(target_files, *[df[c] for c in partition_by])
        if partition_by
        else df.coalesce(target_files)
    )
    writer = writer_df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = f"{path}.__old__"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(glob.glob(f"{path}/**/*.parquet", recursive=True))

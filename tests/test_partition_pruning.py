"""Partitioned-write → partition-pruned read: the layout contract.

write_parquet's partitionBy routing only pays off if the read side
actually prunes directories; these tests close that loop — the written
layout is re-read with a partition-key filter and the scan must (a)
return exactly the filtered rows and (b) list only the matching
partition directories' files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.sinks.files import write_parquet
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "by_type")
    write_parquet(events, out, partition_by=["event_type"])

    back = spark.read.parquet(out)
    one = back.where(F.col("event_type") == "click")

    # Correctness: exactly the filtered rows survive the round trip.
    assert one.count() == events.where(F.col("event_type") == "click").count()

    # Pruning: the scan carries the predicate as a PARTITION filter
    # (directory-level skip), not a post-scan row filter. inputFiles()
    # can't show this — it lists the relation's files before pruning —
    # so assert on the executed plan node.
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan[:500]
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf and "click" in pf, pf


def test_partitioned_write_small_file_discipline(spark, tmp_path):
    """repartition-by-partition-cols keeps file count O(directories),
    not O(tasks x directories)."""
    events = load_table(spark, SF_SMOKE, "events", parallelize=True)
    out = str(tmp_path / "files")
    write_parquet(events, out, partition_by=["event_type"])
    n_types = events.select("event_type").distinct().count()
    files = spark.read.parquet(out).inputFiles()
    assert len(files) == n_types, (len(files), n_types)

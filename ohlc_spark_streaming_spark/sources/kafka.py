"""Kafka source builders (reference: /root/reference/main.py:77-87).

The reference subscribes either to an explicit comma-separated topic list or
a regex pattern, chosen by a small heuristic (main.py:80-85); we keep that
heuristic as a pure, unit-testable function. No Kafka broker exists in the
test environment, so builders are exercised up to (but not including)
``.load()`` in unit tests; the option plumbing is the testable surface.

Scale notes: ``minPartitions`` lets a 1000-executor cluster split hot topic
partitions; ``maxOffsetsPerTrigger`` bounds micro-batch size so state and
shuffle stay predictable under backpressure.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader


def subscription_option(topics: str) -> tuple[str, str]:
    """Choose subscribe vs subscribePattern the way the reference does
    (main.py:80-85): comma list or plain name → ``subscribe``; anything
    containing ``*`` or ``.`` → ``subscribePattern``."""
    if "," in topics or not ("*" in topics or "." in topics):
        return ("subscribe", topics)
    return ("subscribePattern", topics)


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> DataStreamReader:
    """Streaming Kafka reader with the reference's options (main.py:77-87)."""
    opt, value = subscription_option(topics)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option(opt, value)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader


def kafka_batch_reader(
    spark: SparkSession, bootstrap_servers: str, topics: str
):
    """Batch twin (spark.read.format("kafka")) — same options, bounded scan."""
    opt, value = subscription_option(topics)
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option(opt, value)
    )

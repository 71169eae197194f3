"""Kafka sink builders with per-row topic routing
(reference: /root/reference/main.py:191-217).

The reference's key move: the sink DataFrame carries a ``topic`` column, so
one writer fans rows out to per-symbol topics (main.py:173-174,209). The
built-in Kafka sink honors row-level ``topic``/``key``/``value`` — no custom
partitioner needed, and it scales: routing happens executor-side, no
driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_kafka_rows(df: DataFrame) -> DataFrame:
    """P8 sink-cast projection (main.py:192,209): topic/key/value as strings."""
    return df.selectExpr(
        "topic", "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value"
    )


def kafka_stream_writer(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_location: str,
    query_name: str = "kafka_sink",
    output_mode: str = "update",
):
    """Streaming Kafka writer (main.py:208-216). Caller starts it."""
    return (
        to_kafka_rows(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_location)
        .queryName(query_name)
        .outputMode(output_mode)
    )

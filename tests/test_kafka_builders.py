"""Kafka source/sink builders: option heuristics and projections (no broker
in the environment — the option plumbing is the unit-testable surface)."""

from __future__ import annotations

import pytest

from ohlc_spark_streaming_spark.sources.kafka import subscription_option
from ohlc_spark_streaming_spark.streaming.checkpoints import CheckpointManager


@pytest.mark.parametrize(
    "topics,expected",
    [
        # Reference heuristic (/root/reference/main.py:80-85)
        ("topic-a,topic-b", "subscribe"),
        ("plain-topic", "subscribe"),
        ("parsed-trades-.*-usdt", "subscribePattern"),
        ("prefix-*", "subscribePattern"),
        ("a.b", "subscribePattern"),
        ("a,b.*", "subscribe"),  # comma wins, as in the reference
    ],
)
def test_subscription_option(topics, expected):
    opt, value = subscription_option(topics)
    assert opt == expected
    assert value == topics


def test_checkpoint_manager_isolates_queries():
    mgr = CheckpointManager("/tmp/ckpt")
    assert mgr.path_for("kafka_sink") == "/tmp/ckpt/kafka_sink"
    assert mgr.path_for("a") != mgr.path_for("b")
    with pytest.raises(ValueError):
        CheckpointManager("")
    with pytest.raises(ValueError):
        mgr.path_for("bad/name")


def test_to_kafka_rows_projection(spark):
    from ohlc_spark_streaming_spark.sinks.kafka import to_kafka_rows

    df = spark.createDataFrame([("t1", 1, 2)], ["topic", "key", "value"])
    out = to_kafka_rows(df)
    assert out.columns == ["topic", "key", "value"]
    assert dict(out.dtypes) == {"topic": "string", "key": "string", "value": "string"}

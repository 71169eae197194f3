"""File-based streaming sources — the batch tables replayed as streams.

No Kafka broker exists in the test environment, so the streaming layer is
exercised through Spark's file source: the same parquet rows, delivered as
an unbounded-looking stream (SURVEY.md §5.2.3 batch↔stream parity). On a
real deployment the Kafka reader (sources.kafka) slots into the same
pipeline functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_engine_confs

#: Raw (pre-normalization) parquet schema of events: ts is a nanosecond
#: long under spark.sql.legacy.parquet.nanosAsLong (see sources/batch.py).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table from parquet with normalized TIMESTAMP_NTZ ts.

    ``maxFilesPerTrigger=1`` keeps micro-batches bounded; the file source
    checkpoints file names, so semantics mirror a replayed Kafka topic.
    """
    apply_engine_confs(spark)
    # The file source requires a directory; glob-filter down to the events
    # table inside the sf dir.
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Watermarks require TIMESTAMP (not NTZ); with the session pinned to
    # UTC this is the same wall-clock instant as the batch twin's NTZ view.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

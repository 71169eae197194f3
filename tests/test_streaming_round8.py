"""Round-8 streaming additions: the transformWithStateInPandas registry
twins and the incremental rolling-7-day-active view.

The TWS twins share their pandas kernels and batch oracles with the legacy
applyInPandasWithState entries (streaming/stateful.py), so the strongest
cheap check is whole-pipeline equality between the two registry entries.
The rolling-active fold is checked for the property the registry sweep
can't see: state carried ACROSS micro-batches (4-file time-split tape).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ohlc_spark_streaming_spark import registry
from ohlc_spark_streaming_spark._compat import ensure_protobuf
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE

needs_protobuf = pytest.mark.skipif(
    not ensure_protobuf(),
    reason="transformWithState needs google.protobuf and no pure-python "
    "runtime was found on this machine (_compat.ensure_protobuf)",
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@needs_protobuf
def test_tws_gaps_match_legacy_twin(spark):
    """streaming_interarrival_stats_tws equals the legacy
    applyInPandasWithState entry end-to-end (shared _gaps_emit kernel,
    shared percentile rollup)."""
    legacy = registry.QUERIES["streaming_interarrival_stats"](spark, SF_SMOKE)
    tws = registry.QUERIES["streaming_interarrival_stats_tws"](spark, SF_SMOKE)
    assert _rows(tws) == _rows(legacy)


@needs_protobuf
def test_tws_transitions_match_legacy_twin(spark):
    """streaming_transition_counts_tws equals the legacy entry end-to-end
    (shared _transitions_emit kernel)."""
    legacy = registry.QUERIES["streaming_transition_counts"](spark, SF_SMOKE)
    tws = registry.QUERIES["streaming_transition_counts_tws"](spark, SF_SMOKE)
    assert _rows(tws) == _rows(legacy)


@needs_protobuf
def test_tws_error_counts_match_batch(spark):
    """streaming_error_counts_tws equals the batch aggregate (monotonic
    emissions -> max-over-emissions contract on the typed-state API)."""
    got = registry.QUERIES["streaming_error_counts_tws"](spark, SF_SMOKE)
    want = (
        load_table(spark, SF_SMOKE, "events")
        .where("event_type = 'error'")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    assert _rows(got) == _rows(want)


def test_rolling_active_fold_across_batches(tmp_path, spark):
    """The rolling-active island fold must merge state ACROSS micro-batches:
    a 4-file tape (users' activity recurring across files, one file per
    batch via maxFilesPerTrigger=1) folded through interval_union equals
    the batch sweep-line answer exactly — including islands whose activity
    spans multiple batches."""
    from ohlc_spark_streaming_spark.queries.streaming import (
        fold_rolling_active,
    )

    src = str(tmp_path / "events_split")
    events = load_table(spark, SF_SMOKE, "events")
    # repartitionByRange: one part VALUE per file (hash repartition can
    # collide two values into one partition and yield only 3 files);
    # event_id % 4 interleaves every user's timeline across all 4 batches.
    events.withColumn("part", F.col("event_id") % 4).repartitionByRange(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = fold_rolling_active(stream)
    want = registry.QUERIES["rolling_active_7d"](spark, SF_SMOKE)
    assert _rows(got) == _rows(want)


def test_rolling_active_state_is_islands_not_raw_days(spark):
    """The fold's state stays bounded by MERGED islands: contiguous
    activity collapses, so state rows <= distinct (user, day) pairs, with
    strict inequality whenever any user has activity on touching days."""
    from ohlc_spark_streaming_spark.operators.sessions import interval_union

    events = load_table(spark, SF_SMOKE, "events")
    epoch = F.lit("1970-01-01").cast("date")
    days = events.select(
        "user_id", F.datediff(F.col("ts").cast("date"), epoch).alias("d")
    ).distinct()
    n_days = days.count()
    islands = interval_union(
        days.select("user_id", F.col("d").alias("st"), (F.col("d") + 6).alias("en")),
        key_col="user_id",
        start_col="st",
        end_col="en",
    )
    n_islands = islands.count()
    assert n_islands <= n_days
    # sf0.001 has users active on nearby days -> real merging happened.
    assert n_islands < n_days

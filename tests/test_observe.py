"""Dataset.observe metrics ride along with the action — no second scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.plans.metrics import observed
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def test_observed_metrics_match_direct_aggregates(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    obs_df, obs = observed(events, "ev_metrics", null_cols=["user_id", "props"])
    # The action is a WRITE — metrics must materialize as a by-product.
    obs_df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    want_rows = events.count()
    want_null_user = events.where(F.col("user_id").isNull()).count()
    assert got["n_rows"] == want_rows
    assert got["null_user_id"] == want_null_user
    assert got["null_props"] == events.where(F.col("props").isNull()).count()


def test_observed_survives_filter_pushdown(spark):
    """Observation sits ABOVE the filter it wraps: metrics reflect the
    observed node's rows, not the raw scan."""
    events = load_table(spark, SF_SMOKE, "events")
    filtered = events.where(F.col("event_type") == "view")
    obs_df, obs = observed(filtered, "view_metrics")
    n = obs_df.count()
    assert obs.get["n_rows"] == n == filtered.count()

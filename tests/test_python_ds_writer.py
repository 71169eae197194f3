"""Python DataSource WRITER (jsonl_dir): round trip + commit manifest."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.sources.batch import load_table
from ohlc_spark_streaming_spark.sources.python_ds import register_jsonl_sink

from .conftest import SF_SMOKE


def test_jsonl_dir_round_trip_and_manifest(spark, tmp_path):
    register_jsonl_sink(spark)
    out = str(tmp_path / "ds_out")
    df = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "event_type", "user_id")
        .repartition(4)
    )
    df.write.format("jsonl_dir").option("path", out).mode("append").save()

    # Manifest: one entry per writing task, row counts sum to the input.
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == df.count()
    assert len(manifest["files"]) == 4
    assert sum(e["n_rows"] for e in manifest["files"]) == manifest["n_rows"]
    # Every manifest file exists; no orphan data files beyond the manifest.
    data_files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert data_files == {e["name"] for e in manifest["files"]}

    # Round trip: reading the files back yields the same multiset.
    back = spark.read.schema("event_id long, event_type string, user_id long").json(
        os.path.join(out, "*.jsonl")
    )
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want


def test_jsonl_dir_requires_path(spark):
    register_jsonl_sink(spark)
    df = spark.range(3)
    try:
        df.write.format("jsonl_dir").mode("append").save()
        raised = False
    except Exception:
        raised = True
    assert raised

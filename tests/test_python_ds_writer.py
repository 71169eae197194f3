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


def test_jsonl_dir_append_merges_manifest(spark, tmp_path):
    """Second append keeps the first job's files in the manifest (ADVICE r6)."""
    register_jsonl_sink(spark)
    out = str(tmp_path / "ds_append")
    a = spark.range(5).repartition(2)
    b = spark.range(5, 12).repartition(3)
    a.write.format("jsonl_dir").option("path", out).mode("append").save()
    b.write.format("jsonl_dir").option("path", out).mode("append").save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 12
    assert len(manifest["files"]) == 5
    data_files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert data_files == {e["name"] for e in manifest["files"]}


def test_jsonl_dir_overwrite_clears_prior_files(spark, tmp_path):
    """mode('overwrite') leaves no stale part files for glob readers (ADVICE r6)."""
    register_jsonl_sink(spark)
    out = str(tmp_path / "ds_overwrite")
    spark.range(9).repartition(3).write.format("jsonl_dir").option(
        "path", out
    ).mode("append").save()
    spark.range(100, 104).repartition(2).write.format("jsonl_dir").option(
        "path", out
    ).mode("overwrite").save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 4
    assert len(manifest["files"]) == 2
    data_files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert data_files == {e["name"] for e in manifest["files"]}
    back = spark.read.schema("id long").json(os.path.join(out, "*.jsonl"))
    assert sorted(r.id for r in back.collect()) == [100, 101, 102, 103]


def test_jsonl_dir_serializes_temporal_decimal_binary(spark, tmp_path):
    """Timestamp / decimal / binary columns round-trip as text (ADVICE r6)."""
    register_jsonl_sink(spark)
    out = str(tmp_path / "ds_typed")
    df = spark.sql(
        "SELECT TIMESTAMP'2024-05-06 07:08:09' AS ts,"
        " DATE'2024-05-06' AS d,"
        " CAST(12.34 AS DECIMAL(10,2)) AS amt,"
        " CAST('abc' AS BINARY) AS blob"
    )
    df.write.format("jsonl_dir").option("path", out).mode("append").save()
    rows = []
    for fname in os.listdir(out):
        if fname.endswith(".jsonl"):
            with open(os.path.join(out, fname)) as f:
                rows += [json.loads(line) for line in f]
    assert rows == [
        {"ts": "2024-05-06T07:08:09", "d": "2024-05-06", "amt": "12.34", "blob": "YWJj"}
    ]


def test_jsonl_dir_requires_path(spark):
    register_jsonl_sink(spark)
    df = spark.range(3)
    try:
        df.write.format("jsonl_dir").mode("append").save()
        raised = False
    except Exception:
        raised = True
    assert raised

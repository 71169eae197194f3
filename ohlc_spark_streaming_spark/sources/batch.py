"""Batch sources: parquet table loaders over the driver testdata layout.

The reference has no file sources at all (Kafka in, Kafka out —
``/root/reference/main.py:77-87,208-217``); parquet is our batch twin so the
same operators can be driven by the DuckDB oracle (``/root/repo/TESTDATA.md``).

Scale notes: loaders return plain ``spark.read.parquet`` DataFrames —
column pruning and predicate pushdown reach the scan because we never
materialize or cache here. The only non-declarative step is the events
timestamp normalization, which is a single projected expression (stays in
whole-stage codegen).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_engine_confs

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing engine-visible types.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark reads (only) as a
    nanosecond long under ``spark.sql.legacy.parquet.nanosAsLong``; we
    convert to TIMESTAMP_NTZ at microsecond precision — exactly what DuckDB
    surfaces for the same file, so oracle comparisons agree.
    """
    apply_engine_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=None) -> dict[str, DataFrame]:
    from ..schemas import TABLE_NAMES

    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names=None) -> None:
    """Register testdata tables as temp views for the SQL entry path."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)

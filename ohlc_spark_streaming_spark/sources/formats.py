"""Columnar/text batch formats beyond parquet: CSV, JSON lines, ORC.

The reference's only I/O is Kafka (/root/reference/main.py:77-87,208-217);
a complete engine a reference user could switch to also has to ingest the
interchange formats a data platform actually receives. Design rules:

* **Schema is always explicit.** ``inferSchema`` triggers an extra full
  pass over the data at 100 TB and can silently flip types between loads
  (a column of all-numeric strings becomes LONG one day and STRING the
  next) — every reader here takes a ``StructType`` and applies it with
  the strictest parse mode the caller allows.
* **Corrupt-record discipline.** ``PERMISSIVE`` (default) routes broken
  rows into ``_corrupt_record`` so pipelines can quarantine them;
  ``FAILFAST`` is the validation mode for ingest gates. DROPMALFORMED is
  deliberately not exposed: silently losing rows is never the right
  default at scale.
* **Pushdown reality.** ORC scans get predicate pushdown + column
  pruning like parquet; CSV/JSON only prune columns (JSON/CSV predicate
  "pushdown" still reads every byte) — which is why :func:`to_parquet`
  exists: land text formats once, query columnar after.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..session import apply_engine_confs

#: Column name for quarantined rows in PERMISSIVE mode.
CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: T.StructType) -> T.StructType:
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return T.StructType([*schema.fields, T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
    timestamp_format: str | None = None,
) -> DataFrame:
    """Schema-enforced CSV reader (splittable scan; column pruning only)."""
    apply_engine_confs(spark)
    reader = (
        spark.read.schema(
            _with_corrupt_col(schema) if mode == "PERMISSIVE" else schema
        )
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-enforced JSON-lines reader.

    One JSON document per line (the splittable layout — ``multiLine``
    makes each FILE one record and kills scan parallelism, so it is not
    offered here).
    """
    apply_engine_confs(spark)
    return (
        spark.read.schema(
            _with_corrupt_col(schema) if mode == "PERMISSIVE" else schema
        )
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader: columnar twin of the parquet scan (predicate pushdown +
    column pruning both reach the ORC stripes; schema comes from the file
    footer like parquet, so no explicit StructType is needed)."""
    apply_engine_confs(spark)
    return spark.read.orc(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def to_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
) -> None:
    """Land a text-format ingest as parquet (the query-side format): text
    formats are read once, columnar thereafter — at 100 TB re-scanning CSV
    per query pays the full byte volume every time."""
    from ..sinks.files import write_parquet

    write_parquet(df, path, partition_by=partition_by)

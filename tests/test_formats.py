"""Round-trip + corrupt-record tests for the CSV / JSON / ORC readers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ohlc_spark_streaming_spark.sources.batch import load_table
from ohlc_spark_streaming_spark.sources.formats import (
    CORRUPT_COL,
    read_csv,
    read_json,
    read_orc,
    write_csv,
    write_json,
    write_orc,
)

from .conftest import SF_SMOKE

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.DateType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

COLS = [f.name for f in ORDERS_SCHEMA.fields]


def _orders(spark):
    df = load_table(spark, SF_SMOKE, "orders")
    # Testdata ships o_orderdate as timestamp; the interchange schema uses
    # DATE, so normalize the source once for the comparison.
    return df.withColumn("o_orderdate", F.col("o_orderdate").cast("date")).select(
        *COLS
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.select(*COLS).collect()))


def test_csv_round_trip(spark, tmp_path):
    src = _orders(spark)
    path = os.path.join(tmp_path, "orders_csv")
    write_csv(src, path)
    back = read_csv(spark, path, ORDERS_SCHEMA)
    assert [f.name for f in back.schema.fields][:-1] == COLS  # + corrupt col
    assert back.schema[CORRUPT_COL].dataType == T.StringType()
    assert _sorted_rows(back) == _sorted_rows(src)


def test_json_round_trip(spark, tmp_path):
    src = _orders(spark)
    path = os.path.join(tmp_path, "orders_json")
    write_json(src, path)
    back = read_json(spark, path, ORDERS_SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    src = _orders(spark)
    path = os.path.join(tmp_path, "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert _sorted_rows(back) == _sorted_rows(src)
    # Predicate pushdown + column pruning must reach the ORC scan.
    plan = (
        back.where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" not in read_schema


def test_json_corrupt_record_quarantine(spark, tmp_path):
    path = os.path.join(tmp_path, "broken_json")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"o_orderkey": 1, "o_custkey": 2, "o_orderstatus": "O"}\n')
        f.write("{not json at all\n")
        f.write('{"o_orderkey": 3, "o_custkey": 4, "o_orderstatus": "F"}\n')
    back = read_json(spark, path, ORDERS_SCHEMA).cache()
    good = back.where(F.col(CORRUPT_COL).isNull())
    bad = back.where(F.col(CORRUPT_COL).isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "{not json" in bad.collect()[0][CORRUPT_COL]
    back.unpersist()


def test_csv_failfast_raises_on_malformed(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    path = os.path.join(tmp_path, "broken_csv")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.csv"), "w") as f:
        f.write("o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority\n")
        f.write("1,2,O,10.5,2024-01-01,HIGH\n")
        f.write("oops,not,a,number,row,x\n")
    df = read_csv(spark, path, ORDERS_SCHEMA, mode="FAILFAST")
    # Catch ONLY the JVM-side error and pin the message to the malformed
    # -record failure: a bare Exception would let a path or schema bug
    # masquerade as the FAILFAST behavior under test.
    with pytest.raises(Py4JJavaError) as exc_info:
        df.collect()
    msg = str(exc_info.value)
    assert "Malformed" in msg or "FAILFAST" in msg, msg[:500]

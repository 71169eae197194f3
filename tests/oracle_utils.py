"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5.2).

Stricter than the driver on purpose: values must match EXACTLY (bitwise for
floats) so that any engine/oracle divergence is caught here before the
per-round correctness gate runs.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from ohlc_spark_streaming_spark.schemas import TABLE_NAMES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v):
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return _dt.datetime(v.year, v.month, v.day)
    return v


def _sortable(row):
    return tuple(str(x) for x in row)


def compare_query_to_oracle(spark, query_fn, oracle: str, sf_dir: str):
    """Run a registry query and its DuckDB oracle; assert exact equivalence."""
    df = query_fn(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    duck_cols, duck_rows = duckdb_run(oracle, sf_dir)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )

    # Python-type discipline per column: int vs float drift (e.g. DuckDB
    # floor→DOUBLE vs Spark floor→long) would survive a == comparison but
    # can break a driver-side value hash — catch it here.
    def col_types(cols, rows):
        out = {}
        for i, c in enumerate(cols):
            out[c] = {type(r[i]).__name__ for r in rows if r[i] is not None}
        return out

    s_types = col_types(spark_cols, spark_rows)
    d_types = col_types(duck_cols, duck_rows)
    for c in spark_cols:
        assert s_types[c] == d_types[c] or not s_types[c] or not d_types[c], (
            f"type mismatch in column {c}: spark={s_types[c]} duckdb={d_types[c]}"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    # Column-order-insensitive (sort columns by name), row-order-insensitive.
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in spark_rows), key=_sortable
    )
    d_sorted = sorted(
        (tuple(_norm(r[i]) for i in d_idx) for r in duck_rows), key=_sortable
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"value mismatches (first 5): {mismatches[:5]}"

"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5.2).

Stricter than the driver on purpose: values must match EXACTLY (bitwise for
floats) so that any engine/oracle divergence is caught here before the
per-round correctness gate runs.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pyarrow as pa

from ohlc_spark_streaming_spark.schemas import TABLE_NAMES


def duckdb_run(sql: str, sf_dir: str, with_arrow_schema: bool = False):
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        if with_arrow_schema:
            # Second execution: the cursor above is consumed by fetchall().
            # Arrow is how the driver transfers the oracle result, so the
            # Arrow-level types (HUGEINT -> decimal128(38,0), not "int") are
            # the ones its typed value-hash sees.
            arrow_schema = con.execute(sql).arrow().schema
            return cols, rows, arrow_schema
        return cols, rows
    finally:
        con.close()


def _arrow_canon(t: pa.DataType) -> str:
    """Canonical type label for driver-hash-equivalence comparison.

    Collapses representation-only differences the driver's typed hash
    tolerates (string vs large_string, timestamp unit/tz, list flavors,
    integer WIDTH — int32 vs int64 both fetch as lossless Python int, and
    r4 driver rows q7/q8/q9/sample_stratified were green with exactly that
    drift) but keeps the differences it rejects: int-vs-decimal (the q12
    HUGEINT bug class), int-vs-float, decimal scale.
    """
    if pa.types.is_dictionary(t):
        return _arrow_canon(t.value_type)
    if pa.types.is_null(t):
        return "any"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        # Precision never changes a fetched Decimal's repr; scale does
        # (Decimal('1') vs Decimal('1.0000')).
        return f"decimal(scale={t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if (
        pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
        or pa.types.is_fixed_size_binary(t)
    ):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return f"list<{_arrow_canon(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{_arrow_canon(t.key_type)},{_arrow_canon(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{_arrow_canon(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def spark_arrow_schema(df) -> pa.Schema:
    """Arrow schema Spark would produce for df (no data collection)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


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

    # Structural driver-compat gate (VERDICT r8 item 2): the driver's
    # canonicalizer pandas-sorts RAW column values before hashing, and a
    # top-level array column arrives as unhashable numpy arrays — the
    # r8 token_id_encode red. This replica stringifies before sorting,
    # so without this check it would silently pass what the driver
    # rejects.
    from ohlc_spark_streaming_spark.plans.linter import lint_output_schema

    nested = lint_output_schema(df)
    assert not nested, (
        "driver-incompatible nested output columns: "
        + "; ".join(m for _s, _c, m in nested)
    )
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    duck_cols, duck_rows, duck_arrow = duckdb_run(
        oracle, sf_dir, with_arrow_schema=True
    )

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )

    # Arrow-level type discipline: the driver's value hash is typed at the
    # Arrow layer, where e.g. DuckDB SUM(int) surfaces as HUGEINT
    # (decimal128(38,0)) while Spark emits int64 — both fetch as Python
    # `int`, so only an Arrow-schema comparison catches the drift before
    # the driver does (the r4 q12_priority_by_status bug class).
    s_arrow = {f.name: _arrow_canon(f.type) for f in spark_arrow_schema(df)}
    d_arrow = {f.name: _arrow_canon(f.type) for f in duck_arrow}
    arrow_mismatch = {
        c: (s_arrow[c], d_arrow[c])
        for c in spark_cols
        if "any" not in (s_arrow[c], d_arrow[c]) and s_arrow[c] != d_arrow[c]
    }
    assert not arrow_mismatch, (
        f"arrow type mismatch (spark, duckdb): {arrow_mismatch}"
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

"""Guard the guard: the strict comparator must actually FAIL on each
class of divergence it claims to catch (value, row-count, schema,
python-type drift). A comparator that silently passes everything would
leave the whole correctness gate green for the wrong reason.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE
from .oracle_utils import compare_query_to_oracle


def _q(sql):
    return lambda spark, sf_dir: spark.sql(sql)


def test_passes_on_identical(spark):
    compare_query_to_oracle(
        spark,
        _q("SELECT 1 AS a, 'x' AS b"),
        "SELECT 1 AS a, 'x' AS b",
        SF_SMOKE,
    )


def test_fails_on_value_mismatch(spark):
    with pytest.raises(AssertionError, match="value mismatch"):
        compare_query_to_oracle(
            spark,
            _q("SELECT 1 AS a"),
            "SELECT 2 AS a",
            SF_SMOKE,
        )


def test_fails_on_row_count_mismatch(spark):
    with pytest.raises(AssertionError, match="row count"):
        compare_query_to_oracle(
            spark,
            _q("SELECT 1 AS a"),
            "SELECT 1 AS a UNION ALL SELECT 2",
            SF_SMOKE,
        )


def test_fails_on_column_mismatch(spark):
    with pytest.raises(AssertionError, match="column mismatch"):
        compare_query_to_oracle(
            spark,
            _q("SELECT 1 AS a"),
            "SELECT 1 AS b",
            SF_SMOKE,
        )


def test_fails_on_float_ulp_drift(spark):
    # bitwise float discipline: 0.1+0.2 != 0.3 in doubles
    with pytest.raises(AssertionError, match="value mismatch"):
        compare_query_to_oracle(
            spark,
            _q("SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS x"),
            "SELECT CAST(0.3 AS DOUBLE) AS x",
            SF_SMOKE,
        )


def test_fails_on_python_type_drift(spark):
    # int vs float in the same column hashes differently driver-side
    with pytest.raises(AssertionError, match="type mismatch"):
        compare_query_to_oracle(
            spark,
            _q("SELECT CAST(1 AS BIGINT) AS a"),
            "SELECT CAST(1 AS DOUBLE) AS a",
            SF_SMOKE,
        )


def test_fails_on_uncast_integer_sum_hugeint(spark):
    # The r4 q12 bug class: DuckDB SUM(int) is HUGEINT (Arrow
    # decimal128(38,0)); Spark SUM(int) is BIGINT (Arrow int64). Both
    # fetch as Python int, so only the Arrow-schema check can reject it.
    with pytest.raises(AssertionError, match="arrow type mismatch"):
        compare_query_to_oracle(
            spark,
            _q("SELECT SUM(x) AS s FROM (SELECT CAST(1 AS INT) AS x)"),
            "SELECT SUM(x) AS s FROM (SELECT CAST(1 AS INT) AS x)",
            SF_SMOKE,
        )


def test_passes_on_cast_integer_sum(spark):
    compare_query_to_oracle(
        spark,
        _q("SELECT SUM(x) AS s FROM (SELECT CAST(1 AS INT) AS x)"),
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT CAST(1 AS INT) AS x)",
        SF_SMOKE,
    )


def test_tolerates_integer_width_drift(spark):
    # int32 vs int64 both fetch as lossless Python int — the driver hash
    # tolerates this (q7/q8/q9 were green in r4 with exactly this drift).
    compare_query_to_oracle(
        spark,
        _q("SELECT CAST(1 AS INT) AS a"),
        "SELECT CAST(1 AS BIGINT) AS a",
        SF_SMOKE,
    )


def test_fails_on_int_vs_float_drift(spark):
    with pytest.raises(AssertionError, match="type mismatch"):
        compare_query_to_oracle(
            spark,
            _q("SELECT CAST(1 AS INT) AS a"),
            "SELECT CAST(1 AS DOUBLE) AS a",
            SF_SMOKE,
        )

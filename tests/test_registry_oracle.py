"""Every registered query with an oracle must match it exactly at sf0.001.

This mirrors the driver's t2 correctness gate (which runs at sf0.01); running
the full registry at the smallest scale keeps the suite fast while still
exercising identical semantics.
"""

from __future__ import annotations

import pytest

from ohlc_spark_streaming_spark.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE
from .oracle_utils import compare_query_to_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    compare_query_to_oracle(spark, QUERIES[name], ORACLES[name], SF_SMOKE)


def test_all_queries_return_rows(spark):
    for name, fn in QUERIES.items():
        assert fn(spark, SF_SMOKE).limit(1).count() >= 0, name

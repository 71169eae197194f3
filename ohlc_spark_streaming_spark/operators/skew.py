"""Skew-mitigation helpers (SURVEY §4.2 / the 100 TB checklist).

AQE's skew-join splitting handles joins automatically; for AGGREGATIONS
over pathologically hot keys, two-phase salted aggregation is the manual
tool: shard each hot group across ``n_salts`` sub-groups (phase 1 partial
aggregate), then merge the shards (phase 2). Works for any decomposable
aggregate (sum / count / min / max and their decimal-safe forms).

The salt must be deterministic (a hash of a high-cardinality column, not
rand()) so retried tasks produce identical shards — nondeterministic
salting breaks exactly-once under task retry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    salt_source: Column | str,
    n_salts: int = 16,
    value_scale: int = 6,
) -> DataFrame:
    """Exact grouped sum+count via two-phase salted aggregation.

    Phase 1 shuffles on (keys, salt) — a hot key spreads over ``n_salts``
    reducers; phase 2 merges the tiny per-salt partials on keys alone.
    The decimal cast keeps the double sum bit-identical to the unsalted
    form (decimal addition is associative).
    """
    v = F.col(value) if isinstance(value, str) else value
    s = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    salted = df.withColumn("_salt", F.pmod(F.hash(s), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(v.cast(f"decimal(30,{value_scale})")).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").cast("double").alias("sum_value"),
        F.sum("_pcnt").alias("n_rows"),
    )

"""Query registry: every implemented operator, as (Spark callable, oracle SQL).

This is the driver contract's backing store (``/root/repo/__spark_entry__.py``):
``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``; ``ORACLES
[name]`` is the equivalent ANSI SQL DuckDB runs over the same parquet tables.
Names without an oracle get the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible ops).

Determinism discipline (what makes the value-hash comparison pass):

* **Sums of doubles are order-dependent** under parallelism, so every SUM/AVG
  of a double column goes through an exact decimal cast first:
  ``CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)`` on both sides. Decimal
  addition is exact and associative → identical bits regardless of partition
  order. (min/max/count need no such treatment; sums of dyadic rationals
  like 1.0 or k/16 are exact in binary and also safe.)
* Timestamps are TIMESTAMP_NTZ on the Spark side and naive TIMESTAMP in
  DuckDB, with the session timezone pinned to UTC (session.RUNTIME_CONFS).
* Tie-broken extrema use lexicographic struct min/max on both sides
  (Spark ``min(struct(ts, p))`` ≡ DuckDB ``min(struct_pack(t:=ts, p:=value))``
  — SURVEY.md §2.4 tie-break semantics).
* Every computed column is aliased to the same name in both dialects.

Query definitions live in ``queries/`` by family; importing this module
populates the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dec_sum(col, scale: int = 4):
    """Order-independent (exact decimal) sum of a double column, as double."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


# Populate the registry (import order defines no semantics; names are unique).
from .queries import reference as _q_reference  # noqa: E402,F401
from .queries import relational as _q_relational  # noqa: E402,F401
from .queries import tpch as _q_tpch  # noqa: E402,F401
from .queries import llm as _q_llm  # noqa: E402,F401
from .queries import streaming as _q_streaming  # noqa: E402,F401

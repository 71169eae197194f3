"""Pointer-doubling transitive closure vs brute-force ancestor walk.

operators/hierarchy.py closes parent-pointer hierarchies in O(log depth)
joins; hypothesis drives random forests (including deep chains, the case
doubling exists for) and compares against a python parent-walk. Cycle
input must fail loudly, not loop.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.operators.hierarchy import (
    ancestor_closure,
    subtree_rollup,
)


def brute_closure(parents: dict[int, int]) -> set[tuple[int, int]]:
    # Parents are strictly smaller ids (acyclic by construction).
    out = set()
    for node in parents:
        cur = node
        while cur in parents:
            cur = parents[cur]
            out.add((node, cur))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    st.integers(min_value=2, max_value=20),
    st.randoms(use_true_random=False),
)
def test_closure_equals_brute_force(spark, n, rnd):
    # Random forest: each node picks a random smaller parent, or none.
    parents = {}
    for i in range(1, n):
        if rnd.random() < 0.8:
            parents[i] = rnd.randrange(i)
    rows = [(i, parents.get(i)) for i in range(n)]
    edges = spark.createDataFrame(rows, "node long, parent long")
    got = {
        (r["node"], r["anc"]) for r in ancestor_closure(edges).collect()
    }
    assert got == brute_closure(parents), (parents, got)


def test_deep_chain_closes_in_log_rounds(spark):
    """A 64-deep chain: doubling must converge (⌈log2 64⌉ + slack) and
    produce the full n·(n−1)/2 closure of a path graph."""
    n = 64
    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, n)], "node long, parent long"
    )
    closure = ancestor_closure(edges)
    assert closure.count() == n * (n - 1) // 2


def test_cycle_raises(spark):
    """A parent-pointer cycle closes back onto its start node in the
    fixpoint (a (node, node) self-pair) — rejected loudly rather than
    reported as cycle members being each other's ancestors."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "node long, parent long"
    )
    with pytest.raises(ValueError, match="cycle"):
        ancestor_closure(edges, max_rounds=6)


def test_self_loop_raises(spark):
    edges = spark.createDataFrame([(4, 4), (2, 1)], "node long, parent long")
    with pytest.raises(ValueError, match="cycle"):
        ancestor_closure(edges, max_rounds=6)


def test_subtree_rollup_digit_tree(spark):
    """Decimal-digit tree over keys 1..99: node k's subtree sum equals
    the brute-force descendant walk."""
    n = 99
    nodes = spark.createDataFrame(
        [(k, float(k)) for k in range(1, n + 1)], "k long, v double"
    )
    edges = nodes.select(
        "k", F.expr("k DIV 10").alias("parent")
    ).where(F.col("parent") >= 1)
    got = {
        r["k"]: (r["n_nodes"], r["total"])
        for r in subtree_rollup(
            nodes,
            edges,
            "k",
            "parent",
            [
                F.count(F.lit(1)).alias("n_nodes"),
                F.sum("v").alias("total"),
            ],
        ).collect()
    }

    def descendants(k):
        out = [k]
        frontier = [k]
        while frontier:
            nxt = [
                c
                for c in range(1, n + 1)
                if c // 10 in frontier and c not in out
            ]
            out.extend(nxt)
            frontier = nxt
        return out

    for k in (1, 5, 9, 10, 42, 99):
        ds = descendants(k)
        assert got[k] == (len(ds), float(sum(ds))), (k, got[k], ds)

"""Hierarchy traversal: distributed transitive closure over parent pointers.

The missing relational shape after joins/windows/rollups: *recursive*
aggregation over a tree encoded as (node, parent) rows — org charts,
bill-of-materials explosions, category taxonomies, thread ancestry. SQL
engines express it as ``WITH RECURSIVE`` (the oracle does exactly that);
Spark has no recursive CTE, so the engine provides the scalable
equivalent: **pointer doubling**. Each round joins the current
(node → ancestor) frontier to itself, jumping 2^i levels at once, so a
depth-d hierarchy closes in ⌈log2 d⌉ + 1 shuffles instead of d
self-joins. That is the difference between 40 shuffle stages and 6 on a
40-level BOM at 100 TB.

Loop discipline mirrors operators/dedup.py's connected components: each
iteration's frontier is persisted before the convergence probe (a
bounded scalar ``count()``), the previous iteration's cache is released,
and ``localCheckpoint`` truncates lineage so the plan does not grow
exponentially with rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Safety valve: 2^32 levels — no real hierarchy is deeper.
MAX_DOUBLING_ROUNDS = 32


def ancestor_closure(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = MAX_DOUBLING_ROUNDS,
) -> DataFrame:
    """All (node, ancestor) pairs reachable via parent pointers.

    ``edges`` holds one row per child link (node → parent); roots simply
    do not appear as ``node_col`` (or carry a NULL parent, which is
    dropped). Output is the strict closure — (node, ancestor) for every
    ancestor above ``node``, excluding the node itself.

    Pointer doubling: maintain ``paths`` = set of known (node, anc)
    hops. Round i extends every known path by jumping from its endpoint
    through every path starting there — after round i all ancestors
    within 2^i levels are present. Terminates when a round adds no new
    pairs. Each round is ONE equi-join shuffle on the endpoint key plus
    a distinct; rounds are logarithmic in depth, so the shuffle count
    stays single-digit for any human-scale hierarchy.
    """
    paths = (
        edges.where(F.col(parent_col).isNotNull())
        .select(
            F.col(node_col).cast("bigint").alias("node"),
            F.col(parent_col).cast("bigint").alias("anc"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_paths = paths.count()
    for _ in range(max_rounds):
        hop = paths.select(
            F.col("node").alias("_mid"), F.col("anc").alias("_far")
        )
        extended = (
            paths.join(hop, paths["anc"] == hop["_mid"])
            .select("node", F.col("_far").alias("anc"))
            .unionByName(paths)
            .distinct()
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        n_extended = extended.count()  # bounded scalar convergence probe
        paths = extended
        if n_extended == n_paths:
            break
        n_paths = n_extended
    else:
        # Unreachable for finite graphs (the distinct fixpoint always
        # converges) — kept as a hard stop against pathological inputs.
        raise RuntimeError(
            f"ancestor closure did not converge in {max_rounds} doubling rounds"
        )
    # A cycle is the one input that makes "ancestor" meaningless: it
    # closes back onto the start node, which surfaces as a (node, node)
    # self-pair in the fixpoint. Fail loudly instead of returning the
    # cycle members as each other's ancestors.
    if paths.where(F.col("node") == F.col("anc")).limit(1).count() > 0:
        raise ValueError(
            "parent pointers contain a cycle — ancestor closure is undefined"
        )
    return paths


def subtree_rollup(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    parent_col: str,
    agg_exprs: list[Column],
) -> DataFrame:
    """Aggregate every node's full subtree (descendants + itself).

    ``nodes`` carries one row per node with its measures; ``agg_exprs``
    are ready aggregate columns (e.g. ``F.count(F.lit(1)).alias(...)``)
    evaluated over each node's subtree member rows. Composition:
    closure → union the reflexive (node, node) pairs → join measures on
    the member side → group by ancestor. The join is a plain hash
    equi-join on node id (no pairwise anything); result cardinality is
    |nodes|.
    """
    closure = ancestor_closure(edges, node_col, parent_col)
    reflexive = nodes.select(
        F.col(node_col).cast("bigint").alias("node"),
        F.col(node_col).cast("bigint").alias("anc"),
    )
    members = closure.unionByName(reflexive)
    return (
        members.join(
            nodes.withColumnRenamed(node_col, "_member_id"),
            members["node"] == F.col("_member_id"),
        )
        .groupBy(F.col("anc").alias(node_col))
        .agg(*agg_exprs)
    )

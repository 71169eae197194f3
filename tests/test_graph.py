"""PageRank operator vs a python reference implementation."""

from __future__ import annotations

from ohlc_spark_streaming_spark.operators.graph import pagerank


def brute_pagerank(edges, n_iter=2, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {u: [] for u in nodes}
    for u, v in edges:
        out[u].append(v)
    pr = {u: 1.0 / n for u in nodes}
    for _ in range(n_iter):
        units = {u: 0 for u in nodes}
        for u in nodes:
            if not out[u]:
                continue
            t = int((pr[u] / len(out[u])) * 1.0e15 + 0.5)
            for v in out[u]:
                units[v] += t
        pr = {
            u: (1.0 - d) / n + d * (units[u] / 1.0e15) for u in nodes
        }
    return pr


def test_pagerank_matches_reference(spark):
    # Directed graph with a dangling node (4 has no out-edges: its mass
    # leaks, per the declared simplified semantics) and a hub (1).
    edges = [(1, 2), (1, 3), (2, 1), (3, 1), (3, 4), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank(df, n_iter=3).collect()}
    want = brute_pagerank(edges, n_iter=3)
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-12, (node, got[node], want[node])


def test_pagerank_mass_conservation_on_symmetric_graph(spark):
    """Symmetric edges ⇒ no dangling nodes ⇒ total rank mass stays 1
    (up to the 1e-15 contribution quantum per edge)."""
    base = [(i, (i + 1) % 6) for i in range(6)]
    edges = base + [(v, u) for u, v in base]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, n_iter=4).collect()
    total = sum(r["pr"] for r in rows)
    assert abs(total - 1.0) < 1e-9, total


def test_bfs_distances_match_reference(spark):
    from collections import deque

    from ohlc_spark_streaming_spark.operators.graph import bfs_distances

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),  # chain
        (2, 1), (3, 2), (4, 3), (5, 4), (6, 5), (7, 6), (8, 7),
        (1, 9), (9, 1),  # short branch
        (20, 21), (21, 20),  # disconnected component: never reached
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, seed=1, max_hops=4).collect()
    }

    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    want, q = {1: 0}, deque([1])
    while q:
        u = q.popleft()
        if want[u] >= 4:
            continue
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want, (got, want)


def brute_triangles(edges):
    """Per-node triangle counts by direct enumeration."""
    from itertools import combinations

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in und for x in e})
    adj = {n: set() for n in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    cnt = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            cnt[a] += 1
            cnt[b] += 1
            cnt[c] += 1
    return {n: (len(adj[n]), cnt[n]) for n in nodes}


def test_triangle_counts_match_brute_force(spark):
    from ohlc_spark_streaming_spark.operators.graph import triangle_counts

    # K4 glued to a path and a pendant, plus duplicate/reversed/self
    # edges to exercise canonicalization.
    edges = (
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]  # K4: 4 triangles
        + [(4, 5), (5, 6), (6, 4)]  # extra triangle sharing node 4
        + [(6, 7), (7, 8)]  # path tail: no triangles
        + [(2, 1), (3, 1), (5, 5), (1, 2)]  # reversed, self, duplicate
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["deg"], r["n_triangles"]) for r in triangle_counts(df).collect()}
    assert got == brute_triangles(edges)


def test_triangle_counts_random_graphs_match_brute_force(spark):
    import random

    from ohlc_spark_streaming_spark.operators.graph import triangle_counts

    rng = random.Random(20260814)
    for trial in range(3):
        n = 12
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 40))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["deg"], r["n_triangles"])
            for r in triangle_counts(df).collect()
        }
        assert got == brute_triangles(edges), (trial, edges)

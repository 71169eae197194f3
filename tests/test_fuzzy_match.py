"""fuzzy_match_parts' name-group collapse vs brute-force pairwise.

The registry oracle (sf0.001/sf0.01) already exercises the collapse on
real data with up-to-46-fold duplicate names; this covers the edges the
corpus may not: a part with NO matches (must be absent from the
output), a singleton group matched only cross-group, and the
best-match tie-break when the probe member IS the group minimum.
"""

from __future__ import annotations

import itertools

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
    ]
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute(rows, threshold=4):
    out = {}
    for (ka, na), (kb, nb) in itertools.permutations(rows, 2):
        if na.split(" ")[0] != nb.split(" ")[0]:
            continue
        d = _lev(na, nb)
        if d > threshold:
            continue
        cur = out.setdefault(ka, [0, None, None])
        cur[0] += 1
        cand = (d, kb)
        if cur[1] is None or cand < (cur[1], cur[2]):
            cur[1], cur[2] = d, kb
    return {k: (n, d, b) for k, (n, d, b) in out.items()}


def run_fuzzy(spark, rows):
    import ohlc_spark_streaming_spark.queries.analytics as A
    from unittest import mock

    df = spark.createDataFrame(rows, SCHEMA)
    with mock.patch.object(A, "load_table", lambda *_a, **_k: df):
        got = A.q_fuzzy_match_parts(spark, "unused")
    return {
        r["p_partkey"]: (r["n_matches"], r["min_dist"], r["best_match"])
        for r in got.collect()
    }


def test_fuzzy_collapse_edges(spark):
    rows = [
        # group of 3 identical names: intra-group matches, min1/min2 paths
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, "alpha beta gamma"),
        # singleton close to the group (dist 1): cross-group only
        (4, "alpha beta gamm"),
        # singleton in the same block but too far (no matches -> absent)
        (5, "alpha completely different words here"),
        # different block entirely (never compared)
        (6, "omega beta gamma"),
    ]
    assert run_fuzzy(spark, rows) == brute(rows)


def test_fuzzy_collapse_duplicated_corpus(spark):
    # 4 copies each of two near-identical names: k copies must produce
    # the same answers as the k^2 brute force, incl. best-match ids
    rows = []
    k = 0
    for copy in range(4):
        for name in ("one two three", "one two threX"):
            rows.append((k, name))
            k += 1
    assert run_fuzzy(spark, rows) == brute(rows)

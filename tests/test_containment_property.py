"""Property test: directed containment join equals brute force.

Containment C(A→B) = |A∩B| / |A| over 3-token shingle sets. The
prefix filter (probe-side only) and the directed group expansion
(operators/dedup.py) are algebraic rewrites of the all-ordered-pairs
semantics; hypothesis drives duplication-heavy corpora and compares
against an O(n²) python reference.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ohlc_spark_streaming_spark.operators.dedup import (
    containment_pairs,
    release_caches,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
THRESHOLD = 0.8

doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=8).flatmap(
    lambda base: st.lists(
        st.sampled_from([" ".join(d) for d in base]), min_size=2, max_size=14
    )
)


def brute_force_pairs(texts: list[str]) -> dict[tuple[int, int], float]:
    def shingles(text: str) -> set[str]:
        toks = text.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    sets = {i: s for i, s in sets.items() if s}
    out = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            cont = len(sets[a] & sets[b]) / len(sets[a])
            if cont >= THRESHOLD:
                out[(a, b)] = cont
    return out


@pytest.mark.parametrize("collapse", [True, False])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(corpus_strategy)
def test_containment_equals_brute_force(spark, collapse, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            docs, threshold=THRESHOLD, collapse=collapse
        ).collect()
    }
    release_caches()
    want = brute_force_pairs(texts)
    assert set(got) == set(want), (sorted(got), sorted(want), texts)
    for pair, cont in want.items():
        assert abs(got[pair] - cont) < 1e-12, (pair, got[pair], cont, texts)


def test_containment_is_directed(spark):
    """A short doc quoted inside a long one: containment fires A→B only
    — exactly the asymmetry Jaccard cannot express."""
    short = "alpha beta gamma delta"  # 2 shingles, both inside `long`
    long = "alpha beta gamma delta eps zeta eta theta alpha beta gamma"
    docs = spark.createDataFrame(
        [(0, short), (1, long)], "doc_id long, text string"
    )
    rows = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.8, collapse=False).collect()
    }
    release_caches()
    assert rows == {(0, 1): 1.0}

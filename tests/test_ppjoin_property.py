"""Property test: the collapsed PPJoin equals brute-force global Jaccard.

The distinct-set collapse + group expansion (operators/dedup.py) is an
algebraic rewrite of the all-pairs semantics; hypothesis drives random
corpora (heavy duplication included, the case the collapse exists for)
and compares against an O(n²) python reference over raw token trigrams.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ohlc_spark_streaming_spark.operators.dedup import (
    jaccard_ppjoin_pairs,
    release_caches,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
THRESHOLD = 0.5

doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10)
# Duplication-heavy corpora: draw up to 8 base docs, then repeat some.
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
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            jac = inter / union
            if jac >= THRESHOLD:
                out[(a, b)] = jac
    return out


@pytest.mark.parametrize("collapse", [True, False])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(corpus_strategy)
def test_ppjoin_equals_brute_force(spark, collapse, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_ppjoin_pairs(
            docs, threshold=THRESHOLD, collapse=collapse
        ).collect()
    }
    want = brute_force_pairs(texts)
    assert set(got) == set(want), (sorted(got), sorted(want), texts)
    for pair, jac in want.items():
        assert abs(got[pair] - jac) < 1e-12, (pair, got[pair], jac, texts)


def test_ppjoin_collapse_decision(spark):
    """The 1-row duplication aggregate picks the collapsed plan exactly for
    duplication-heavy corpora. Observable via the cache ledger: the
    collapsed path persists (sets, groups), the direct path only sets."""
    release_caches()
    # 8 distinct rotations of the vocab — every shingle set unique.
    unique = [" ".join(VOCAB[i % 8] for i in range(j, j + 5)) for j in range(8)]
    docs = spark.createDataFrame(
        list(enumerate(unique)), "doc_id long, text string"
    )
    jaccard_ppjoin_pairs(docs, threshold=THRESHOLD).collect()
    assert release_caches() == 1, "low-duplication corpus must skip the collapse"

    duplicated = ["alpha beta gamma delta eps", "zeta eta theta alpha beta"] * 6
    docs = spark.createDataFrame(
        list(enumerate(duplicated)), "doc_id long, text string"
    )
    jaccard_ppjoin_pairs(docs, threshold=THRESHOLD).collect()
    assert release_caches() == 2, "duplication-heavy corpus must collapse"

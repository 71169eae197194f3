"""Property tests: suffix-array exact span and the round-9 pure kernels
equal O(n²) python references under hypothesis-driven corpora.

The suffix strategy leans on small vocabularies so duplicated runs,
within-doc repeats, full-doc copies and single-token docs all occur
naturally — the corner cases a fixed corpus misses.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ohlc_spark_streaming_spark.operators.suffix import suffix_span_exact
from ohlc_spark_streaming_spark.streaming.neardup import _bucket_emit
from ohlc_spark_streaming_spark.streaming.stateful import (
    SESSION_GAP_US,
    _session_fold,
)

VOCAB = ["a", "b", "c", "d"]

doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=6)


def _brute_spans(docs: dict[int, list[str]]) -> dict[int, tuple[int, int]]:
    occ: dict[tuple[int, str], int] = defaultdict(int)
    for t in docs.values():
        for k in range(1, len(t) + 1):
            for p in range(len(t) - k + 1):
                occ[(k, " ".join(t[p : p + k]))] += 1
    out = {}
    for d, t in docs.items():
        best = {p: 0 for p in range(len(t))}
        for k in range(1, len(t) + 1):
            for p in range(len(t) - k + 1):
                if occ[(k, " ".join(t[p : p + k]))] >= 2:
                    best[p] = max(best[p], k)
        mx = max(best.values()) if best else 0
        out[d] = (mx, sum(1 for v in best.values() if v == mx))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(corpus_strategy)
def test_suffix_span_property(spark, texts):
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.span_exact, r.n_at_max)
        for r in suffix_span_exact(docs).collect()
    }
    want = _brute_spans({i: t for i, t in enumerate(texts)})
    assert got == want, (got, want, texts)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.sampled_from(["f1", "f2", "f3", "f4"]), max_size=8),
    st.sets(st.sampled_from(["f1", "f2", "f3", "f4"]), max_size=3),
)
def test_bucket_emit_property(fps, known):
    """The emission SET equals all unordered pairs of distinct contents
    that were not already co-known; additions = genuinely new fps."""
    pairs, added = _bucket_emit(fps, set(known))
    new = [f for f in dict.fromkeys(fps) if f not in known]
    assert added == set(new)
    want = set()
    seen = set(known)
    for f in new:
        for o in seen:
            want.add((min(f, o), max(f, o)))
        seen.add(f)
    assert set(pairs) == want
    assert len(pairs) == len(set(pairs))  # no double emission


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=20 * SESSION_GAP_US),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_session_fold_split_invariance(ts_list, n_splits):
    """Folding the same sorted event tape in ANY batch split yields the
    same closed sessions + final open state — the property that makes
    micro-batch boundaries invisible (the streaming query relies on it)."""
    ts = sorted(ts_list)
    units = [1] * len(ts)
    whole_closed, whole_state = _session_fold(ts, units, None)

    # arbitrary contiguous split into n chunks
    import math

    step = math.ceil(len(ts) / n_splits)
    closed_all, state = [], None
    for i in range(0, len(ts), step):
        closed, state = _session_fold(
            ts[i : i + step], units[i : i + step], state
        )
        closed_all.extend(closed)
    assert closed_all == whole_closed
    assert state == whole_state


def _brute_contam(
    docs: dict[int, list[str]], evalset: set[int]
) -> dict[int, tuple[int, int]]:
    eg = set()
    for d in evalset:
        t = docs[d]
        for k in range(1, len(t) + 1):
            for p in range(len(t) - k + 1):
                eg.add((k, " ".join(t[p : p + k])))
    out = {}
    for d, t in docs.items():
        if d in evalset:
            continue
        best = {p: 0 for p in range(len(t))}
        for k in range(1, len(t) + 1):
            for p in range(len(t) - k + 1):
                if (k, " ".join(t[p : p + k])) in eg:
                    best[p] = max(best[p], k)
        mx = max(best.values()) if best else 0
        out[d] = (mx, sum(1 for v in best.values() if v == mx))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(corpus_strategy, st.data())
def test_cross_contamination_property(spark, texts, data):
    """cross_contamination_best equals the O(n²) train-gram ∩ eval-gram
    brute force for every train doc, under random corpora and random
    eval subsets (including empty eval, all-eval, eval == train copies —
    the nearest-eval-window corner cases a fixed corpus misses)."""
    from pyspark.sql import functions as F

    from ohlc_spark_streaming_spark.operators.suffix import (
        cross_contamination_best,
    )

    ids = list(range(len(texts)))
    evalset = set(
        data.draw(st.lists(st.sampled_from(ids), unique=True, max_size=len(ids)))
    )
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.contam_span, r.n_at_max)
        for r in cross_contamination_best(
            docs, F.col("doc_id").isin(list(evalset) or [-1])
        ).collect()
    }
    want = _brute_contam({i: t for i, t in enumerate(texts)}, evalset)
    assert got == want, (got, want, texts, evalset)

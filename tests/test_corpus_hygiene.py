"""Plan + semantics guards for the corpus-hygiene operators
(quality_repetition, decontaminate_ngram, domain_mixture).

Correctness vs the DuckDB oracle is covered by test_registry_oracle; here
we pin the 100 TB-relevant plan shapes and the semantic invariants the
oracle can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.queries.llm import DOMAIN_TARGET_BPS
from ohlc_spark_streaming_spark.registry import QUERIES

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_quality_repetition_is_shuffle_free(spark):
    """The run-length fold keeps bigram counting inside the row: the whole
    query must execute without a single exchange (at 100 TB this is a pure
    map-only pass over the corpus)."""
    df = QUERIES["quality_repetition"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Exchange" not in plan, plan


def test_quality_repetition_values(spark):
    rows = {r["doc_id"]: r for r in QUERIES["quality_repetition"](spark, SF_SMOKE).collect()}
    assert rows, "no documents scored"
    for r in rows.values():
        assert r["n_tokens"] >= 2
        assert 0.0 <= r["dup_word_frac"] < 1.0
        # top bigram count is at least 1 occurrence out of n-1 bigrams
        assert 0.0 < r["top_bigram_frac"] <= 1.0
        assert r["is_repetitive"] == (
            r["dup_word_frac"] > 0.82 or r["top_bigram_frac"] > 0.18
        )


def test_decontaminate_broadcasts_benchmark_set(spark):
    """The eval-set trigram membership check must be a broadcast hash
    join — shuffling the corpus side against a tiny benchmark is the
    wrong plan at any scale."""
    df = QUERIES["decontaminate_ngram"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_excludes_benchmark_docs(spark):
    rows = QUERIES["decontaminate_ngram"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 20 != 0, "benchmark docs must not be scored"
        assert 0 <= r["n_hits"] <= r["n_trigrams"]
        assert r["is_contaminated"] == (r["contamination_frac"] >= 0.8)


def test_domain_mixture_rates_and_counts(spark):
    rows = {r["lang"]: r for r in QUERIES["domain_mixture"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(DOMAIN_TARGET_BPS)
    for lang, r in rows.items():
        assert r["target_bps"] == DOMAIN_TARGET_BPS[lang]
        assert 0 <= r["rate_bps"] <= 10000
        assert 0 <= r["n_sampled"] <= r["n_docs"]
        # rate_bps == 10000 means keep everything: the sample must then be
        # the full language slice.
        if r["rate_bps"] == 10000:
            assert r["n_sampled"] == r["n_docs"]


def test_domain_mixture_sample_is_content_stable(spark):
    """Re-running the query yields the identical sample (content-hash
    membership, no rand())."""
    a = sorted(map(tuple, QUERIES["domain_mixture"](spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, QUERIES["domain_mixture"](spark, SF_SMOKE).collect()))
    assert a == b

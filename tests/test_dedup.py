"""Dedup-operator invariants beyond the registry oracles."""

from __future__ import annotations

from ohlc_spark_streaming_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_ppjoin_pairs,
)
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def _as_set(df):
    return {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in df.collect()}


def test_ppjoin_prefix_filter_is_lossless(spark):
    """The PPJoin prefix filter must not drop any qualifying pair: its
    output equals the UNFILTERED global count join (no blocks, no bands)
    at the same threshold."""
    docs = load_table(spark, SF_SMOKE, "documents")
    brute = jaccard_pairs(
        docs, block_cols=(), shingle_n=3, threshold=0.5, length_band=None
    )
    pp = jaccard_ppjoin_pairs(docs, threshold=0.5)
    assert _as_set(pp) == _as_set(brute)
    assert len(_as_set(pp)) > 0


def test_ppjoin_lossless_at_high_threshold(spark):
    """Same losslessness at a tighter threshold (shorter prefixes — the
    filter prunes harder and a boundary off-by-one would show here)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    brute = jaccard_pairs(
        docs, block_cols=(), shingle_n=3, threshold=0.9, length_band=None
    )
    pp = jaccard_ppjoin_pairs(docs, threshold=0.9)
    assert _as_set(pp) == _as_set(brute)

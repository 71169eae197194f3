"""Short-document edge cases for the n-gram corpus-hygiene queries.

The driver testdata's shortest document has 10 tokens, so the <3-token
paths of quality_repetition / decontaminate_ngram / text_lm_coverage never
ran under the oracle gate. Unguarded, Spark's ``F.sequence(1, n-2)``
DESCENDS for short docs ([1, 0] or [1, 0, -1]) and ``concat_ws`` silently
skips the null ``F.get`` lookups, fabricating bogus n-grams — while the
DuckDB oracle's ``range()`` yields an empty list and drops the doc. This
suite replays the exact oracle comparison on a corpus that is mostly
1/2/3-token documents.
"""

from __future__ import annotations

import os

import pytest

from ohlc_spark_streaming_spark.registry import ORACLES, QUERIES
from ohlc_spark_streaming_spark.schemas import TABLE_NAMES

from .conftest import SF_SMOKE
from .oracle_utils import compare_query_to_oracle

SHORT_DOCS = [
    # (doc_id, text) — doc_id 0/20/40 land in decontaminate's pseudo-benchmark
    (0, "alpha"),
    (1, "alpha"),
    (2, "alpha beta"),
    (3, "beta beta"),
    (20, "alpha beta gamma"),
    (21, "alpha beta gamma"),
    (22, "alpha beta gamma delta"),
    (23, "one two three four five six seven eight nine ten"),
    (40, "one two three four five six seven eight nine ten"),
    (41, "repeat repeat repeat repeat repeat repeat"),
]


@pytest.fixture(scope="module")
def short_sf_dir(spark, tmp_path_factory):
    """A testdata dir whose documents table is dominated by <3-token docs;
    every other table is symlinked from the smoke SF so the oracle's view
    registration still finds them."""
    d = tmp_path_factory.mktemp("short_docs_sf")
    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(f"{SF_SMOKE}/{name}.parquet", d / f"{name}.parquet")
    rows = [
        (doc_id, text, "en", "synthetic", len(text)) for doc_id, text in SHORT_DOCS
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # A single file keeps doc ordering deterministic for both engines.
    tmp_out = str(d / "_documents_out")
    df.coalesce(1).write.parquet(tmp_out)
    part = next(p for p in os.listdir(tmp_out) if p.endswith(".parquet"))
    os.rename(os.path.join(tmp_out, part), d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name", ["quality_repetition", "decontaminate_ngram", "text_lm_coverage"]
)
def test_short_doc_oracle_parity(spark, short_sf_dir, name):
    compare_query_to_oracle(spark, QUERIES[name], ORACLES[name], short_sf_dir)


def test_quality_repetition_drops_single_token_docs(spark, short_sf_dir):
    ids = {r["doc_id"] for r in QUERIES["quality_repetition"](spark, short_sf_dir).collect()}
    assert 0 not in ids and 1 not in ids, "1-token docs are unscorable"
    assert 2 in ids and 3 in ids, "2-token docs have exactly one bigram"


def test_decontaminate_emits_no_bogus_trigrams(spark, short_sf_dir):
    rows = {r["doc_id"]: r for r in QUERIES["decontaminate_ngram"](spark, short_sf_dir).collect()}
    # <3-token non-benchmark docs must be absent (no trigram to score).
    for short_id in (1, 2, 3):
        assert short_id not in rows
    # 23 repeats benchmark doc 40's text verbatim -> fully contaminated.
    assert rows[23]["is_contaminated"]
    assert rows[23]["n_hits"] == rows[23]["n_trigrams"] == 8


def test_lm_coverage_drops_single_token_docs(spark, short_sf_dir):
    ids = {r["doc_id"] for r in QUERIES["text_lm_coverage"](spark, short_sf_dir).collect()}
    assert 0 not in ids and 1 not in ids

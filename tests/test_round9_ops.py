"""Round-9 batch additions: pow2 longest-duplicated-span.

The oracle sweep proves Spark↔DuckDB agreement on real data; these tests
pin the SEMANTICS on planted corpora where the right answer is known by
construction — cross-doc shared runs, within-doc self-repeats, and the
no-duplication zero case.
"""

from __future__ import annotations

from ohlc_spark_streaming_spark import registry


def _mk_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _spans(spark, sf_dir):
    out = registry.QUERIES["dedup_span_pow2"](spark, sf_dir).collect()
    return {r.doc_id: (r.span_pow2, r.n_dup_at_max) for r in out}


def test_span_pow2_planted(tmp_path, spark):
    """Known-by-construction answers: a 40-token run shared across two
    docs yields span 32 in both (a 32-window fits in the run, no
    64-window repeats); a 16-token phrase repeated WITHIN one doc yields
    16 (self-repeats count); an all-unique-token doc yields 0."""
    shared = [f"s{i}" for i in range(40)]
    doc_a = [f"a{i}" for i in range(15)] + shared + [f"z{i}" for i in range(15)]
    doc_b = [f"b{i}" for i in range(10)] + shared + [f"y{i}" for i in range(10)]
    phrase = [f"p{i}" for i in range(16)]
    doc_c = phrase + ["sep0"] + phrase
    doc_d = [f"u{i}" for i in range(30)]
    sf = _mk_docs(
        spark,
        tmp_path,
        [" ".join(doc_a), " ".join(doc_b), " ".join(doc_c), " ".join(doc_d)],
    )
    spans = _spans(spark, sf)
    assert spans[0][0] == 32 and spans[1][0] == 32
    # doc_a has 40-32+1 = 9 duplicated 32-windows (all inside the run)
    assert spans[0][1] == 9 and spans[1][1] == 9
    assert spans[2][0] == 16
    assert spans[3] == (0, 0)


def test_span_pow2_exact_copy_caps_at_doc_length(tmp_path, spark):
    """Verbatim duplicate docs: span equals the largest level ≤ length;
    a copy flood (3 identical docs) leaves the per-doc answer unchanged
    (duplication COUNTS rise only at level boundaries — n_dup is the
    window count, invariant to how many copies exist)."""
    text = " ".join(f"t{i}" for i in range(70))
    sf = _mk_docs(spark, tmp_path, [text, text, text])
    spans = _spans(spark, sf)
    # 70 tokens ≥ 64: whole-doc 64-windows are duplicated across copies
    assert all(v[0] == 64 for v in spans.values())
    assert all(v[1] == 70 - 64 + 1 for v in spans.values())

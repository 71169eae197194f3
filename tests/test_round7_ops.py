"""Round-7 operators: duplicated-span extents, markup strip, PII redaction,
embedding whitening. Cross-engine equivalence is covered by the registry
oracle sweep (test_registry_oracle.py); these tests pin the SEMANTIC
properties the oracle comparison alone can't express."""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.queries.llm import (
    _PII_EMAIL_RE,
    _PII_IPV4_RE,
    _PII_PHONE_RE,
    _html_render_col,
    _strip_markup_col,
    _whitened_embeddings,
    q_pii_redact,
    q_text_strip_markup,
)
from ohlc_spark_streaming_spark.queries.analytics import q_dedup_span_extents
from ohlc_spark_streaming_spark.registry import QUERIES

from .conftest import SF_SMOKE


def test_span_extents_are_maximal_and_disjoint(spark):
    """Per doc, spans must be pairwise disjoint AND non-adjacent (a gap of
    at least one non-duplicated token between islands) — i.e. the interval
    union really produced MAXIMAL extents, and each span is wide enough to
    hold at least one 8-token window."""
    rows = q_dedup_span_extents(spark, SF_SMOKE).collect()
    assert rows, "sf0.001 corpus should contain duplicated spans"
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r.span_tokens == r.span_end - r.span_start + 1
        assert r.span_tokens >= 8  # at least one whole window
        assert r.n_windows >= 1
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r.span_start)
        for a, b in zip(spans, spans[1:]):
            # closed-interval islands: merged if b.start <= a.end + 1,
            # so maximality demands a strict gap
            assert b.span_start > a.span_end + 1, (doc_id, a, b)


def test_span_extents_cover_known_duplicate(spark):
    """Two docs sharing identical text must each carry one full-width span
    (every window duplicated → one island covering all token positions)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("_r7_docs")
    # replay the query shape against the tiny frame via temp parquet
    import tempfile

    d = tempfile.mkdtemp(prefix="r7span_")
    docs.write.mode("overwrite").parquet(d + "/documents.parquet")
    rows = q_dedup_span_extents(spark, d).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in rows}
    # 10 tokens, K=8 → windows at pos 1..3, all duplicated across docs 1,2
    assert got == {(1, 1, 10), (2, 1, 10)}


def test_strip_markup_roundtrip_holds_corpus_wide(spark):
    out = q_text_strip_markup(spark, SF_SMOKE)
    assert out.where(~F.col("roundtrip_ok")).count() == 0
    assert out.where(F.col("removed_chars") <= 0).count() == 0


def test_strip_markup_handles_double_encoding(spark):
    """&amp;lt; must decode to &lt; (one pass), not < (double decode)."""
    df = spark.createDataFrame(
        [("<p>a &amp;lt; b</p> <script>x</script> c&nbsp;d",)], "s string"
    )
    got = df.select(_strip_markup_col(F.col("s")).alias("c")).head().c
    assert got == "a &lt; b c d"


def test_pii_redact_scrubs_every_family(spark):
    """After redaction no family pattern may survive — checked on the
    actual redacted TEXT (the query ships only its md5), replayed through
    the same render + redact expressions."""
    from ohlc_spark_streaming_spark.sources.batch import load_table
    from ohlc_spark_streaming_spark.queries.llm import _pii_render_col

    docs = load_table(spark, SF_SMOKE, "documents")
    pii = _pii_render_col()
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(pii, _PII_EMAIL_RE, "[EMAIL]"),
            _PII_PHONE_RE,
            "[PHONE]",
        ),
        _PII_IPV4_RE,
        "[IP]",
    )
    sample = docs.select(red.alias("r")).limit(50).collect()
    assert sample
    for row in sample:
        for pat in (_PII_EMAIL_RE, _PII_PHONE_RE, _PII_IPV4_RE):
            assert not re.search(pat, row.r), (pat, row.r)
        assert "[EMAIL]" in row.r and "[PHONE]" in row.r and "[IP]" in row.r

    out = q_pii_redact(spark, SF_SMOKE)
    bad = out.where(
        (F.col("n_email") < 1) | (F.col("n_phone") < 1) | (F.col("n_ip") < 1)
    ).count()
    assert bad == 0


def test_pii_regexes_edge_cases(spark):
    """Boundary behavior pinned: multiple hits, end-of-string IPv4,
    digits adjoining a phone, no false positives on plain prose."""
    cases = [
        ("mail a@b.co and c.d+x@e-f.org now", 2, 0, 0),
        ("call +12345678 or +442071234567", 0, 2, 0),
        ("srv 10.0.0.1 gw 192.168.255.254", 0, 0, 2),
        ("ends with 8.8.8.8", 0, 0, 1),
        ("no pii in this sentence at all", 0, 0, 0),
        ("version 1.2.3 is not an ip", 0, 0, 0),
    ]
    df = spark.createDataFrame(cases, "s string, e int, p int, i int")
    n = lambda pat: F.size(F.regexp_extract_all("s", F.lit(pat), 0))  # noqa: E731
    rows = df.select(
        "s", "e", "p", "i",
        n(_PII_EMAIL_RE).alias("ge"),
        n(_PII_PHONE_RE).alias("gp"),
        n(_PII_IPV4_RE).alias("gi"),
    ).collect()
    for r in rows:
        assert (r.ge, r.gp, r.gi) == (r.e, r.p, r.i), r


def test_whitening_centers_and_scales(spark):
    """The whitened corpus must have per-dim mean ~0 and variance ~1
    (population variance; eps keeps exact-constant dims finite)."""
    w = _whitened_embeddings(spark, SF_SMOKE)
    mat = np.array([r.embedding for r in w.collect()])
    assert mat.ndim == 2 and mat.shape[1] >= 8
    means = mat.mean(axis=0)
    variances = mat.var(axis=0)
    assert np.abs(means).max() < 1e-6
    # dims with real spread must land within eps-rounding of unit variance
    live = variances > 0.5
    assert live.any()
    assert np.abs(variances[live] - 1.0).max() < 1e-3


def test_bloom_never_false_negative_and_sane_fp(spark):
    """The Bloom guarantee: every true member is a candidate. FP rate is
    whatever the m/k geometry yields, but must stay a valid ratio."""
    row = QUERIES["bloom_prune_audit"](spark, SF_SMOKE).head()
    assert row.n_false_neg == 0
    assert row.n_true <= row.n_candidates <= row.n_probe_keys
    assert 0.0 <= row.fp_rate <= 1.0


def test_kmeans_update_is_memberwise_mean(spark):
    """Replay one Lloyd step in numpy: assignments by argmin-L2 to the
    first 8 vectors (ties → smallest id), new centroids = member means."""
    from ohlc_spark_streaming_spark.sources.batch import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in emb])
    mat = np.array([np.array(r.embedding, dtype=np.float64) for r in emb])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    seeds = mat[ids < 8]
    d2 = ((mat[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # argmin returns smallest index on ties

    got = QUERIES["kmeans_update_step"](spark, SF_SMOKE).collect()
    for r in got:
        members = mat[assign == r.cell]
        assert r.n_members == len(members)
        want = members[:, r.dim - 1].mean()
        assert abs(r.new_c - want) < 1e-9, (r.cell, r.dim)
        assert abs(r.shift - (want - seeds[r.cell, r.dim - 1])) < 1e-9


def test_whiten_ivf_ranks_are_dense_topk(spark):
    out = QUERIES["embedding_whiten_ivf"](spark, SF_SMOKE).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q, "expected at least one query with neighbors"
    for qid, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)), (qid, ranks)
        assert len(ranks) <= 5
        sims = [r.cos_sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True), (qid, sims)


# --- round-7 session-2 operators ---------------------------------------------


def test_snapshot_diff_class_counts_reconcile(spark):
    """The diff classes must reconcile exactly with the deterministic
    edit recipe: every %93 key is added (at key+1e8), every %91-not-%89
    key removed, every %89 key changed (price +1.0 always differs), and
    the rest unchanged."""
    from ohlc_spark_streaming_spark.queries.analytics import (
        q_snapshot_diff_orders,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    got = {
        r.change_type: r.n_rows
        for r in q_snapshot_diff_orders(spark, SF_SMOKE).collect()
    }
    keys = [
        r.k
        for r in load_table(spark, SF_SMOKE, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .collect()
    ]
    n = len(keys)
    exp_added = sum(1 for k in keys if k % 93 == 0)
    exp_removed = sum(1 for k in keys if k % 91 == 0 and k % 89 != 0)
    exp_changed = sum(1 for k in keys if k % 89 == 0)
    assert got.get("added", 0) == exp_added
    assert got.get("removed", 0) == exp_removed
    assert got.get("changed", 0) == exp_changed
    assert got.get("unchanged", 0) == n - exp_removed - exp_changed


def test_join_cardinality_actual_matches_executed_join(spark):
    """actual_rows (computed join-free from per-key counts) must equal
    the row count of the actually-executed join."""
    from ohlc_spark_streaming_spark.queries.analytics import (
        q_join_cardinality_audit,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    row = q_join_cardinality_audit(spark, SF_SMOKE).collect()[0]
    lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-01-01 00:00:00").cast("timestamp")
    l = load_table(spark, SF_SMOKE, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    o = load_table(spark, SF_SMOKE, "orders")
    executed = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert row.actual_rows == executed
    assert row.est_rows > 0
    assert abs(row.err_ratio - row.actual_rows / row.est_rows) < 1e-12


def test_contrastive_negatives_are_clean(spark):
    """Every emitted negative must be (a) distinct from anchor and
    positive and (b) non-adjacent to the anchor in the co-purchase
    edge set — the false-negative hygiene guarantee."""
    from ohlc_spark_streaming_spark.queries.analytics import (
        q_contrastive_pairs,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = q_contrastive_pairs(spark, SF_SMOKE).collect()
    assert rows, "expected surviving negatives on the sf0.001 graph"
    assert len(rows) <= 100  # 50 positives x 2 candidates max
    bp = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order: dict[int, set] = {}
    for r in bp:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    for r in rows:
        assert r.j in (0, 1)
        assert r.neg != r.anchor and r.neg != r.pos
        assert (min(r.anchor, r.neg), max(r.anchor, r.neg)) not in edges


def test_ewma_is_a_convex_combination(spark):
    """EWMA must equal close when the trailing window holds a single
    candle, and always lie within [min, max] of the closes it averages
    (convexity of the normalized dyadic weights)."""
    from ohlc_spark_streaming_spark.queries.analytics import q_ewma_candles
    from ohlc_spark_streaming_spark.operators.ohlc import ohlc_candles
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = q_ewma_candles(spark, SF_SMOKE).collect()
    assert rows
    closes: dict[tuple, float] = {}
    hours: dict[str, list] = {}
    candles = ohlc_candles(
        load_table(spark, SF_SMOKE, "events"),
        ts_col="ts", symbol_col="event_type", price_col="value",
        qty_col=None, window_duration="1 hour",
    ).collect()
    for c in candles:
        hh = int(c.window_start.timestamp()) // 3600
        closes[(c.symbol, hh)] = round(c.close * 100) / 100.0
        hours.setdefault(c.symbol, []).append(hh)
    n_single = 0
    for r in rows:
        hh = int(r.window_start.timestamp()) // 3600
        trailing = [
            closes[(r.symbol, h)]
            for h in range(hh - 11, hh + 1)
            if (r.symbol, h) in closes
        ]
        assert r.n_window == len(trailing)
        assert min(trailing) - 1e-9 <= r.ewma <= max(trailing) + 1e-9
        if r.n_window == 1:
            n_single += 1
            assert r.ewma == r.close


def test_pit_join_never_leaks_future_state(spark):
    """The PIT guarantee: every attached state must come from a browsing
    event at-or-before the purchase ts, and must be the LATEST such
    state change — never a future leak, never a stale skip."""
    from ohlc_spark_streaming_spark.queries.analytics import (
        q_pit_feature_join,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = q_pit_feature_join(spark, SF_SMOKE).collect()
    assert rows
    ev = load_table(spark, SF_SMOKE, "events").collect()
    browse: dict[int, dict] = {}
    for e in ev:
        if e.event_type != "purchase":
            key = (e.user_id, e.ts)
            cur = browse.get(key)
            if cur is None or e.event_id > cur[0]:
                browse[key] = (e.event_id, e.event_type)
    # per-user time-ordered state sequence (collapsed per ts)
    seq: dict[int, list] = {}
    for (uid, ts), (_eid, st) in browse.items():
        seq.setdefault(uid, []).append((ts, st))
    for uid in seq:
        seq[uid].sort()
    n_matched = 0
    for r in rows:
        states = [(ts, st) for ts, st in seq.get(r.user_id, []) if ts <= r.ts]
        if not states:
            assert r.state is None and r.state_since is None
            continue
        n_matched += 1
        assert r.state_since <= r.ts  # never from the future
        assert r.state == states[-1][1]  # the latest at-or-before state
    assert n_matched > 0


def test_skew_audit_identities(spark):
    """Top keys must be the true heaviest, shares/ratios must reconcile
    with the totals, and rows are freq-descending."""
    from ohlc_spark_streaming_spark.queries.analytics import q_join_skew_audit
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = q_join_skew_audit(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    freq: dict[int, int] = {}
    for r in li:
        freq[r.l_orderkey] = freq.get(r.l_orderkey, 0) + 1
    true_top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.k, r.freq) for r in rows] == true_top
    for r in rows:
        assert r.n_rows == len(li) and r.n_keys == len(freq)
        assert abs(r.share - r.freq / r.n_rows) < 1e-15
        assert abs(r.skew_ratio - r.freq / (r.n_rows / r.n_keys)) < 1e-12


def test_token_id_encode_roundtrip(spark):
    """ids must decode back to the original token prefix through the
    vocabulary (rank -> token), with 0 exactly where the token is
    out-of-vocabulary."""
    from ohlc_spark_streaming_spark.queries.llm import (
        _ENC_PREFIX,
        _ENC_VOCAB,
        q_token_id_encode,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = q_token_id_encode(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    assert set(docs) == {r.doc_id for r in rows}
    counts: dict[str, int] = {}
    for toks in docs.values():
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_ENC_VOCAB]
    id_of = {tok: i + 1 for i, (tok, _c) in enumerate(ranked)}
    n_oov_total = 0
    for r in rows:
        prefix = docs[r.doc_id][:_ENC_PREFIX]
        ids = [int(x) for x in r.ids_str.split(" ")] if r.ids_str else []
        assert r.n_tokens == len(prefix) == len(ids)
        expected = [id_of.get(t, 0) for t in prefix]
        assert ids == expected
        assert r.n_oov == sum(1 for i in expected if i == 0)
        n_oov_total += r.n_oov
    if len(counts) <= _ENC_VOCAB:
        # every token is in-vocabulary at this corpus size
        assert n_oov_total == 0


def test_length_bucket_batches_invariants(spark):
    """Every batch must respect the token budget (except declared
    singleton oversize batches), pad to its bucket ceiling, and cover
    every document exactly once."""
    from ohlc_spark_streaming_spark.queries.llm import (
        _BATCH_TOKENS,
        _BUCKET_WIDTH,
        q_length_bucket_batches,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = q_length_bucket_batches(spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    assert sum(r.n_docs for r in rows) == len(docs)
    assert sum(r.sum_tokens for r in rows) == sum(
        len(d.text.split(" ")) for d in docs
    )
    for r in rows:
        assert r.pad_len == (r.bucket + 1) * _BUCKET_WIDTH
        assert r.padded_tokens == r.n_docs * r.pad_len
        if r.pad_len <= _BATCH_TOKENS:
            assert r.padded_tokens <= _BATCH_TOKENS
        else:  # oversized docs: declared singleton batches
            assert r.n_docs == 1
        # docs in the bucket are shorter than the ceiling but longer
        # than the previous bucket's ceiling
        assert r.sum_tokens <= r.n_docs * r.pad_len
        assert r.sum_tokens > r.n_docs * (r.pad_len - _BUCKET_WIDTH)
        assert 0.0 <= r.waste_ratio < 1.0


def test_source_interleave_ratio_correct_in_prefixes(spark):
    """The interleave order must be a permutation, per-source ranks must
    be contiguous from 1, and in any prefix closed under a full stride
    cycle src0 appears ~4x and src1 ~2x as often as a default source."""
    from ohlc_spark_streaming_spark.queries.llm import (
        q_source_interleave_order,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = sorted(
        q_source_interleave_order(spark, SF_SMOKE).collect(),
        key=lambda r: r.interleave_rank,
    )
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    assert len(rows) == len(docs)
    assert [r.interleave_rank for r in rows] == list(range(1, len(rows) + 1))
    assert {r.doc_id for r in rows} == {d.doc_id for d in docs}
    # per-source ranks contiguous, vt = rank * stride
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
        stride = {"src0": 3, "src1": 6}.get(r.source, 12)
        assert r.vt == r.src_rank * stride
    for src, rs in per_src.items():
        assert sorted(x.src_rank for x in rs) == list(range(1, len(rs) + 1))
        # emission order respects per-source rank order
        by_rank = sorted(rs, key=lambda x: x.src_rank)
        ranks = [x.interleave_rank for x in by_rank]
        assert ranks == sorted(ranks)
    # ratio check on a vt-closed prefix: everything with vt <= 36 holds
    # 12 src0 docs, 6 src1 docs, 3 of each default source (if available)
    n_src0 = sum(1 for r in rows if r.source == "src0" and r.vt <= 36)
    n_src1 = sum(1 for r in rows if r.source == "src1" and r.vt <= 36)
    n_src2 = sum(1 for r in rows if r.source == "src2" and r.vt <= 36)
    avail = lambda s: sum(1 for d in docs if d.source == s)  # noqa: E731
    assert n_src0 == min(12, avail("src0"))
    assert n_src1 == min(6, avail("src1"))
    assert n_src2 == min(3, avail("src2"))


def test_span_cut_reconstructs_and_agrees_with_extents(spark):
    """The cut must remove EXACTLY the tokens covered by the maximal
    duplicated spans (n_cut == sum of span_tokens from
    dedup_span_extents), the scrubbed md5 must equal a from-scratch
    Python replay, and untouched docs must keep their original text."""
    import hashlib

    from ohlc_spark_streaming_spark.queries.analytics import (
        _SPAN_K,
        q_dedup_span_cut,
        q_dedup_span_extents,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = {r.doc_id: r for r in q_dedup_span_cut(spark, SF_SMOKE).collect()}
    extents: dict[int, list] = {}
    for e in q_dedup_span_extents(spark, SF_SMOKE).collect():
        extents.setdefault(e.doc_id, []).append(e)
    docs = {
        d.doc_id: d.text.split(" ")
        for d in load_table(spark, SF_SMOKE, "documents").collect()
    }
    assert set(rows) == set(docs)
    # independent replay: corpus-duplicated windows -> covered positions
    win_docs: dict[str, set] = {}
    for did, toks in docs.items():
        for i in range(len(toks) - _SPAN_K + 1):
            win_docs.setdefault(" ".join(toks[i : i + _SPAN_K]), set()).add(did)
    n_with_spans = 0
    for did, toks in docs.items():
        covered = set()
        for i in range(len(toks) - _SPAN_K + 1):
            if len(win_docs[" ".join(toks[i : i + _SPAN_K])]) >= 2:
                covered.update(range(i, i + _SPAN_K))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        r = rows[did]
        assert r.n_tokens == len(toks)
        assert r.n_kept == len(kept)
        assert r.n_cut == len(covered)
        assert r.scrub_md5 == hashlib.md5(" ".join(kept).encode()).hexdigest()
        exts = extents.get(did, [])
        assert r.n_spans == len(exts)
        assert r.n_cut == sum(e.span_tokens for e in exts)
        if exts:
            n_with_spans += 1
        else:
            assert r.scrub_md5 == hashlib.md5(
                " ".join(toks).encode()
            ).hexdigest()
    assert n_with_spans > 0  # the fixture must actually exercise the cut


def test_curation_report_funnel_identities(spark):
    """The funnel must be monotone per source, reconcile exactly with
    its component queries (survivorship clusters, exact dedup), and
    count every raw document exactly once."""
    from ohlc_spark_streaming_spark.queries.analytics import (
        q_corpus_curation_report,
    )
    from ohlc_spark_streaming_spark.queries.llm import (
        q_dedup_exact,
        q_dedup_survivorship,
    )
    from ohlc_spark_streaming_spark.sources.batch import load_table

    rows = q_corpus_curation_report(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    assert sum(r.n_docs_raw for r in rows) == len(docs)
    for r in rows:
        assert r.n_docs_raw >= r.n_docs_exact >= r.n_docs_surviving >= 0
        assert r.n_tokens_surviving >= r.n_tokens_final >= 0
    # survivors == clusters (one golden record each)
    surv_rows = q_dedup_survivorship(spark, SF_SMOKE).collect()
    assert sum(r.n_docs_surviving for r in rows) == len(surv_rows)
    assert sum(r.n_members for r in surv_rows) == len(docs)
    # exact keeps == distinct texts
    exact_rows = q_dedup_exact(spark, SF_SMOKE).collect()
    assert sum(r.n_docs_exact for r in rows) == len(exact_rows)
    # the fixture must exercise near-dup collapse (sf0.001 has near-dups
    # but no byte-identical texts, so only >= holds for the exact stage)
    assert sum(r.n_docs_exact for r in rows) > sum(
        r.n_docs_surviving for r in rows
    )

"""Round-11 operators: boilerplate_cut planted-phrase proof."""

from __future__ import annotations

import os
import shutil
import tempfile

# Registry first: queries.analytics cannot be the package's FIRST import
# (queries.streaming's module-level analytics imports would see it
# partially initialized).
from ohlc_spark_streaming_spark import registry as _registry  # noqa: F401
from ohlc_spark_streaming_spark.functions.hashing import P


def _rh(s: str) -> int:
    """Python twin of functions.hashing.rolling_hash."""
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def test_incremental_eval_gram_gate_two_phase(tmp_path, spark):
    """The fully incremental decontamination gate's append proof
    (streaming_decontaminate_incr): fold HALF the eval corpus into the
    gram state, then fold an eval-side APPEND (two more files, so the
    delta anti-join path runs across real micro-batches) into the SAME
    state, and the grown state must (a) equal a from-scratch batch
    rebuild over the full eval corpus gram-for-gram and (b) gate the
    train stream identically to the batch recompute (the
    streaming_decontaminate twin's rows)."""
    from pyspark.sql import functions as F

    from ohlc_spark_streaming_spark.queries.streaming import (
        _DECON_SRC,
        build_eval_grams,
        fold_decontaminate,
        fold_eval_grams,
    )
    from ohlc_spark_streaming_spark.registry import QUERIES
    from ohlc_spark_streaming_spark.sources.batch import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    eval_docs = docs.where(F.col("source") == _DECON_SRC)
    # Eval doc_ids at this SF are the multiples of 20 (all even — a
    # parity split would leave phase 2 EMPTY and the append path
    # untested; caught by self-review). Halve on mod 40 instead, and
    # sanity-pin both halves non-empty.
    evala = eval_docs.where(F.col("doc_id") % 40 == 0)
    evalb = eval_docs.where(F.col("doc_id") % 40 != 0)
    assert evala.count() > 0 and evalb.count() > 0

    def tape(df, path, n_files):
        # Bucket on doc_id div 40 (consecutive eval docs alternate
        # buckets) so the phase-2 tape really is n_files files — phase 2
        # must run n_files real micro-batches for the delta anti-join
        # path to exercise.
        df.withColumn(
            "part", F.expr("doc_id div 40") % n_files
        ).repartitionByRange(n_files, "part").drop("part").write.mode(
            "overwrite"
        ).parquet(path)
        n_written = len(
            [f for f in os.listdir(path) if f.endswith(".parquet")]
        )
        assert n_written == n_files, (path, n_written)
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
        )

    # Phase 1: half the eval corpus -> state S1.
    s1 = fold_eval_grams(tape(evala, str(tmp_path / "eval_a"), 1))
    want_a = {r.gram for r in build_eval_grams(evala).df.collect()}
    assert {r.gram for r in s1.df.collect()} == want_a

    # Phase 2: eval-side APPEND folded into S1 (two files -> the
    # second batch exercises the anti-join delta against grown state).
    s2 = fold_eval_grams(tape(evalb, str(tmp_path / "eval_b"), 2), state=s1)
    want_full = {r.gram for r in build_eval_grams(eval_docs).df.collect()}
    assert want_full > want_a  # the append REALLY added grams
    assert {r.gram for r in s2.df.collect()} == want_full

    # The grown state gates the train stream exactly like the batch
    # recompute over the full eval corpus.
    train = docs.where(F.col("source") != _DECON_SRC)
    got = fold_decontaminate(tape(train, str(tmp_path / "train"), 2), s2.df)
    want = QUERIES["streaming_decontaminate"](spark, SF_SMOKE)
    as_rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert as_rows(got) == as_rows(want)


def test_boilerplate_cut_planted(spark):
    """boilerplate_cut semantics by construction: a 12-token phrase
    repeated across three docs enters the catalog and EVERY occurrence
    is cut (including two occurrences inside one doc); a 12-token
    phrase occurring once and an 11-token repeated run (too short to
    form a repeated 12-gram) both survive; and the per-source scrub
    checksums equal the sum/xor of the rolling hash of the expected
    ``doc_id:kept_text`` — byte-for-byte, recomputed in Python."""
    from ohlc_spark_streaming_spark.queries.analytics import (
        _BOILER_K,
        q_boilerplate_cut,
    )

    assert _BOILER_K == 12
    boiler = [f"b{i}" for i in range(12)]    # the repeated phrase
    once = [f"o{i}" for i in range(12)]      # occurs once -> survives
    short = [f"s{i}" for i in range(11)]     # 11 tokens -> survives
    texts = {
        # srcA: boilerplate twice in doc 0 (non-adjacent), once in doc 1
        0: ("srcA", ["x0", "x1"] + boiler + ["x2"] + boiler + ["x3"]),
        1: ("srcA", boiler + ["y0"] + once),
        # srcB: one more occurrence (3 docs total), plus the survivors
        2: ("srcB", ["z0"] + boiler),
        3: ("srcB", ["z1"] + short + ["z2"] + short),
        4: ("srcB", [f"u{i}" for i in range(14)]),
    }
    kept_expected = {
        0: ["x0", "x1", "x2", "x3"],
        1: ["y0"] + once,
        2: ["z0"],
        3: texts[3][1],
        4: texts[4][1],
    }
    tape = tempfile.mkdtemp(prefix="bcut_docs_")
    try:
        spark.createDataFrame(
            [(k, src, " ".join(v)) for k, (src, v) in texts.items()],
            "doc_id long, source string, text string",
        ).write.mode("overwrite").parquet(
            os.path.join(tape, "documents.parquet")
        )
        got = {r.source: r for r in q_boilerplate_cut(spark, tape).collect()}
    finally:
        shutil.rmtree(tape, ignore_errors=True)

    want = {}
    for d, (src, toks) in texts.items():
        w = want.setdefault(
            src,
            {"n": 0, "touched": 0, "before": 0, "after": 0, "sum": 0, "xor": 0},
        )
        kept = kept_expected[d]
        h = _rh(f"{d}:{' '.join(kept)}")
        w["n"] += 1
        w["touched"] += int(len(kept) != len(toks))
        w["before"] += len(toks)
        w["after"] += len(kept)
        w["sum"] += h
        w["xor"] ^= h
    assert set(got) == set(want)
    for src, w in want.items():
        r = got[src]
        assert r.n_docs == w["n"], (src, r)
        assert r.docs_touched == w["touched"], (src, r)
        assert r.tokens_before == w["before"], (src, r)
        assert r.tokens_after == w["after"], (src, r)
        assert r.tokens_cut == w["before"] - w["after"], (src, r)
        assert r.scrub_sum == w["sum"], (src, r)
        assert r.scrub_xor == w["xor"], (src, r)

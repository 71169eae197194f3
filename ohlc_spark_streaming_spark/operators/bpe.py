"""Multi-iteration BPE tokenizer training (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016 — the
public algorithm GPT-2/RoBERTa tokenizers train with).

``bpe_top_merges`` (queries/llm.py) is ONE merge-counting step; this is
the whole training loop (VERDICT r12 item 5): per round, count adjacent
symbol pairs across the corpus, pick the winner, apply it greedily
left-to-right to every word, repeat. Driver-coordinated like
``lloyd_train``: the merge table is O(n_merges) driver state; per round
the cluster does one pair-count aggregate (a small shuffle over the
DISTINCT-WORD table, not the corpus) and one narrow fold that rewrites
each word's symbol array in place.

Scale contract (100 TB): the corpus is scanned ONCE to build the
(word, freq) table — the classic BPE-training collapse; everything
after runs on distinct words weighted by frequency. Merge application
is a per-row ``F.aggregate`` fold (whole-stage codegen, no Python, no
shuffle); pair counting shuffles only (pair, partial-count) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms): the distinct-word table BPE trains on, with
    each word pre-split into its initial character symbols."""
    w = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    return (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split(F.col("word"), ""))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the symbol arrays, weighted by word
    frequency — bpe_top_merges' pair expression (zip_with over two
    slices, NOT positional lookups) applied to evolving symbols."""
    ch = F.col("syms")
    n = F.size(ch)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ch, 1, n - 1),
            F.slice(ch, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def apply_merge(sym_col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right, non-overlapping application of one merge
    rule to a symbol array, as a single whole-stage-codegen fold: the
    accumulator array's last element merges with the incoming symbol
    iff they equal (left, right). The fold IS the textbook greedy scan:
    consecutive matches only arise when left == right (a char run), and
    the fold merges alternate positions exactly as the scan does (a
    just-merged tail equals left+right, which can never equal ``left``,
    so the next symbol starts fresh — pinned adversarially in
    tests/test_bpe.py against a pure-Python reference)."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train_rules(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Train ``n_merges`` BPE merge rules over the corpus. Each round:
    one pair-count aggregate over the distinct-word table, a 1-row
    winner collect ((cnt DESC, pair ASC) tie-break — deterministic),
    and a narrow fold applying the winner. Returns the merge rules
    [(step, pair, merged, cnt)] — the O(n_merges) driver-side artifact
    a tokenizer ships (:func:`bpe_encode` applies it). Stops early if
    no pair is left (every word fully merged)."""
    # Cache the evolving word table: without it, round k replays k
    # folds from the corpus scan (O(n²) passes). One generation stays
    # cached; the previous one unpersists after the current collect
    # has materialized its child.
    words = word_freqs(docs, text_col).persist()
    spent: DataFrame | None = None
    rules: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            top = (
                _pair_counts(words)
                .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if spent is not None:
                spent.unpersist()
                spent = None
            if not top:
                break
            pair, cnt = top[0].pair, top[0].cnt
            left, right = pair.split(" ")
            rules.append((step, pair, left + right, cnt))
            spent = words
            words = words.withColumn(
                "syms", apply_merge(F.col("syms"), left, right)
            ).persist()
    finally:
        words.unpersist()
        if spent is not None:
            spent.unpersist()
    return rules


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """:func:`bpe_train_rules` as a DataFrame (step, pair, merged,
    cnt) — the registry-facing merge table."""
    return docs.sparkSession.createDataFrame(
        bpe_train_rules(docs, n_merges, text_col),
        schema="step long, pair string, merged string, cnt long",
    )


def bpe_encode(
    words: DataFrame,
    rules: list[tuple[int, str, str, int]],
    sym_col: str = "syms",
) -> DataFrame:
    """Apply a trained merge table to a (…, ``sym_col``) relation — the
    SERVING half of BPE: every rule folds over the symbol arrays in
    training order (merge priority IS training order — Sennrich et
    al.'s encoder), each application the same greedy
    whole-stage-codegen scan as training. n_merges chained narrow
    folds, zero shuffles — at 100 TB the tokenizer is a map-only
    stage."""
    out = words
    for step, pair, _merged, _cnt in sorted(rules):
        left, right = pair.split(" ")
        out = out.withColumn(
            sym_col, apply_merge(F.col(sym_col), left, right)
        )
    return out

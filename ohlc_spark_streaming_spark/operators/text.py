"""Text-analysis operators: quality scoring, language ID, token counting,
document fingerprinting (SURVEY.md §2.11).

All are narrow, codegen'd column pipelines over the documents table; the
only shuffles are explicit aggregations. Language ID is an n-gram/lexicon
overlap heuristic with a deterministic argmax so the oracle can replay it;
real deployments would swap the profile table for trained frequencies —
the operator shape (broadcast profiles → overlap score → argmax) is the
part that matters at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import rolling_hash
from ..functions.textops import BPE_ISH_PATTERN, STOPWORDS, tokens

#: Tiny per-language lexicons for the overlap heuristic (shared with the
#: oracle SQL — see queries/llm.py).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "fast", "slow"),
    "es": ("el", "la", "los", "de", "query", "tabla"),
    "de": ("der", "die", "das", "und", "gross", "klein"),
    "fr": ("le", "la", "les", "et", "vite", "petit"),
    "zh": ("de5", "shi4", "zai4", "le5", "hao3", "da4"),
}


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    toks = tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.length(text_col).cast("long").alias("text_len"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_bpeish_tokens"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality features: length, lexical diversity, stopword
    density, mean token length. Ratios are double divisions of exact
    integers — bitwise reproducible cross-engine."""
    toks = tokens(text_col)
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        (uniq / n).alias("type_token_ratio"),
        (stop / n).alias("stopword_ratio"),
        ((F.length(text_col) - n + 1) / n).alias("mean_token_len"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Lexicon-overlap language ID with deterministic tie-break.

    Scores = |distinct doc tokens ∩ profile|; argmax over languages, ties
    to the lexicographically smallest language code; score 0 → 'und'.
    """
    toks = F.array_distinct(tokens(text_col))
    scored = docs.select(
        F.col(id_col),
        *[
            F.size(F.filter(toks, lambda t: t.isin(*words))).alias(f"score_{lang}")
            for lang, words in sorted(LANG_PROFILES.items())
        ],
    )
    # argmax via greatest + first matching (lexicographic language order).
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_PROFILES)])
    pred = F.lit("und")
    for lang in sorted(LANG_PROFILES, reverse=True):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        id_col, pred.alias("pred_lang"), best.cast("long").alias("best_score")
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: polynomial rolling hash (order-sensitive) +
    sha2-256 digest (content-exact)."""
    return docs.select(
        F.col(id_col),
        rolling_hash(text_col).alias("roll_hash"),
        F.sha2(F.col(text_col), 256).alias("sha256_hex"),
    )

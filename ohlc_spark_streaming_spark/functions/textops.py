"""Text-analysis expressions: tokenization, shingles, quality features.

Whitespace tokenization is the contract (matches DuckDB ``string_split``
exactly, including empty-string behavior on clean single-spaced text); a
BPE-ish regex tokenizer is provided for token counting where subword-like
granularity is wanted. Everything is built-in column expressions — narrow,
codegen'd, shuffle-free until an explicit aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fixed stopword list for quality scoring (shared with the oracle SQL).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: BPE-ish word/number/punctuation splitter for token counting: words,
#: digit runs, or single non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col) -> Column:
    """Whitespace tokens (the cross-engine tokenization contract)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def distinct_tokens(col) -> Column:
    return F.array_distinct(tokens(col))


def shingles(col, n: int = 3) -> Column:
    """Token n-grams (shingles) as space-joined strings — the MinHash /
    Jaccard input unit. Sliding slice over the token array; documents
    shorter than n tokens yield their full token string as one shingle."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )


def stopword_count(col) -> Column:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def stopwords_sql_list() -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

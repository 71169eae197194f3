"""LLM-data-pipeline queries: dedup, text analysis, similarity, multimodal
(SURVEY.md §2.11) over the documents/embeddings tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.batch import load_table


@register(
    "dedup_exact",
    """
SELECT
  min(doc_id) AS doc_id,
  count(*)    AS n_copies
FROM documents
GROUP BY text
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text.

    One shuffle on the text hash; at 100 TB you'd group on sha2(text, 256)
    instead of the raw text to cap shuffle width (see dedup_fingerprint)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


@register(
    "text_token_count",
    """
SELECT
  doc_id,
  len(string_split(text, ' '))                AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
  length(text)                                AS text_len
FROM documents
""",
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts per document — narrow ops only, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_unique_tokens"),
        F.length("text").cast("long").alias("text_len"),
    )

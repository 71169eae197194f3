"""Event-analytics + corpus-forensics queries (round 4 widening).

Adds the operator shapes a production pipeline team reaches for next,
after the SURVEY §2 core is covered:

* substring-span dedup (token-window collisions across documents — the
  scalable analogue of suffix-array training-data dedup),
* a conditional bigram language model (per-head next-token top-k),
* linear quality-classifier scoring (model inference as a scan-shaped
  projection with broadcast weights),
* ordered funnel conversion over the events stream,
* two-pass z-score anomaly detection (tiny stats aggregate broadcast
  back — never a window over a 5-partition skewed key),
* forward as-of join with a match tolerance (the other half of the
  reference domain's nearest-event join; operators/joins.py).

Every query is oracle-backed; determinism discipline follows
registry.py (decimal-exact sums, shared scalar expression shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join
from ..registry import register
from ..sources.batch import load_table

_TOKENS = "string_split(text, ' ')"

# --- substring-span dedup ----------------------------------------------------

_SPAN_K = 8  # tokens per window


@register(
    "dedup_span_windows",
    f"""
WITH wins AS (
  SELECT doc_id,
         CASE WHEN len({_TOKENS}) >= {_SPAN_K}
              THEN list_transform(
                     range(1, len({_TOKENS}) - {_SPAN_K} + 2),
                     i -> array_to_string(
                            list_slice({_TOKENS}, i, i + {_SPAN_K} - 1), ' '))
              ELSE CAST([] AS VARCHAR[]) END AS w
  FROM documents
),
pairs AS (SELECT DISTINCT doc_id, unnest(w) AS win FROM wins),
counts AS (
  SELECT win, count(*) AS n_docs FROM pairs GROUP BY win
)
SELECT
  p.doc_id,
  count(*)                                                AS n_windows,
  CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS n_dup_windows,
  SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) / count(*) AS dup_frac
FROM pairs p JOIN counts c USING (win)
GROUP BY p.doc_id
""",
)
def q_dedup_span_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-span dedup: the scalable stand-in for suffix-array
    training-data dedup — every 8-token sliding window, counted across
    the corpus; a document's ``dup_frac`` is the share of its distinct
    windows that also appear in some other document.

    Scale: the explode is O(tokens) rows (same budget as shingling);
    the window-string groupBy is one hash shuffle with partial
    aggregation (hot common phrases combine map-side), and the join
    back is window-keyed — no pairwise comparison anywhere, so 100 TB
    costs scan + 2 exchanges, not O(docs^2)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    wins = F.when(
        n >= _SPAN_K,
        F.transform(
            F.sequence(F.lit(1), n - _SPAN_K + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, _SPAN_K)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = (
        docs.select("doc_id", F.explode(wins).alias("win"))
        .distinct()
    )
    counts = pairs.groupBy("win").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
    return (
        pairs.join(counts, "win")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            dup.alias("n_dup_windows"),
            (dup / F.count(F.lit(1))).alias("dup_frac"),
        )
    )


# --- conditional bigram language model ---------------------------------------


@register(
    "lm_bigram_topk",
    f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
bigrams AS (
  SELECT unnest(list_transform(range(1, len(t)),
                               i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
  FROM toks WHERE len(t) >= 2
),
counted AS (
  SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS cnt FROM bigrams GROUP BY 1, 2
)
SELECT w1, w2, cnt, rank FROM (
  SELECT w1, w2, cnt,
         row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2 ASC) AS rank
  FROM counted
) WHERE rank <= 3
""",
)
def q_lm_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram LM: for every head token, the top-3 next
    tokens by corpus count (count desc, token asc — fully tie-broken).

    Scale: bigram explode is O(tokens); ONE count shuffle on (w1, w2)
    with map-side partial aggregation, then a per-w1 top-k window over
    the already-tiny counted table. The window input is |vocab|^2
    bounded, not corpus-sized — ranking never touches raw tokens."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.get(toks, i - 1).alias("w1"), F.get(toks, i).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    counted = (
        docs.select(F.explode(bi).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("w1").orderBy(F.col("cnt").desc(), F.col("w2").asc())
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("w1", "w2", "cnt", "rank")
    )


# --- linear quality-classifier scoring ----------------------------------------


@register(
    "quality_classifier_bucket",
    f"""
WITH feats AS (
  SELECT doc_id,
         len({_TOKENS}) AS n_tokens,
         len(list_distinct({_TOKENS})) / len({_TOKENS}) AS ttr
  FROM documents
),
scored AS (
  SELECT doc_id,
         0.5 * (least(n_tokens, 100) / 100.0) + 0.375 * ttr AS score
  FROM feats
)
SELECT
  CAST(floor(score * 8) AS BIGINT) AS bucket,
  count(*)                         AS n_docs,
  min(doc_id)                      AS min_doc_id,
  max(doc_id)                      AS max_doc_id
FROM scored
GROUP BY 1
""",
)
def q_quality_classifier_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model scoring as a scan: a fixed linear quality classifier
    (dyadic weights 1/2 and 3/8 over length + lexical-diversity
    features) applied in-row, bucketed to 1/8-score-wide histogram
    bins. The inference-over-corpus shape: weights are literals
    (broadcast in the real deployment), scoring is projection-only —
    no shuffle until the final tiny histogram aggregate.

    Determinism: features are integer-exact ratios; the score is the
    same IEEE expression shape on both engines, so bucket edges agree
    bitwise."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n
    score = (
        F.lit(0.5) * (F.least(n, F.lit(100)) / F.lit(100.0))
        + F.lit(0.375) * ttr
    )
    return (
        docs.select(
            "doc_id", F.floor(score * 8).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# --- ordered funnel conversion -------------------------------------------------


@register(
    "funnel_conversion",
    """
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
flags AS (
  SELECT
    CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS s1,
    CASE WHEN t_signup IS NOT NULL AND t_view  > t_signup THEN 1 ELSE 0 END AS s2,
    CASE WHEN t_signup IS NOT NULL AND t_view  > t_signup
          AND t_click > t_view THEN 1 ELSE 0 END AS s3,
    CASE WHEN t_signup IS NOT NULL AND t_view  > t_signup
          AND t_click > t_view AND t_purchase > t_click THEN 1 ELSE 0 END AS s4
  FROM stages
)
SELECT
  count(*)                 AS n_users,
  CAST(SUM(s1) AS BIGINT)  AS n_signup,
  CAST(SUM(s2) AS BIGINT)  AS n_view_after,
  CAST(SUM(s3) AS BIGINT)  AS n_click_after,
  CAST(SUM(s4) AS BIGINT)  AS n_purchase_after
FROM flags
""",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose FIRST signup precedes their first
    view precedes their first click precedes their first purchase —
    the standard product-analytics conversion query.

    Scale: conditional min() aggregation gives one hash shuffle on
    user_id with full map-side partial aggregation (4 timestamps per
    user flow through the exchange, not the raw events); the flag
    reduction is a 1-row aggregate. No self-joins, no window over a
    low-cardinality key."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    stages = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & (F.col("t_click") > F.col("t_view"))
    s4 = s3 & (F.col("t_purchase") > F.col("t_click"))
    as_flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(as_flag(s1)).alias("n_signup"),
        F.sum(as_flag(s2)).alias("n_view_after"),
        F.sum(as_flag(s3)).alias("n_click_after"),
        F.sum(as_flag(s4)).alias("n_purchase_after"),
    )


# --- two-pass z-score anomaly detection ----------------------------------------


@register(
    "anomaly_zscore_events",
    """
WITH stats AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(12,6))
                  * CAST(value AS DECIMAL(12,6))) AS DOUBLE) AS ss
  FROM events GROUP BY event_type
),
bounds AS (
  SELECT event_type, n, s / n AS mean,
         sqrt(greatest(ss / n - (s / n) * (s / n), 0.0)) AS sd
  FROM stats
)
SELECT
  e.event_type,
  any_value(b.n)                                   AS n_events,
  CAST(SUM(CASE WHEN abs(e.value - b.mean) > 3 * b.sd THEN 1 ELSE 0 END)
       AS BIGINT)                                  AS n_anomalies,
  min(CASE WHEN abs(e.value - b.mean) > 3 * b.sd THEN e.event_id END)
                                                   AS first_anomaly_id
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
""",
)
def q_anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass z-score outlier detection per event_type: exact
    decimal-summed mean/variance (order-independent bits), then a
    second scan flags |value - mean| > 3·sd.

    Scale: event_type has ~5 values — a window over it would funnel
    the whole table through 5 partitions. Instead the stats aggregate
    (5 rows) is computed with map-side partials and BROADCAST back to
    the scan, so the flagging pass is shuffle-free and the only wide
    exchange is the tiny final per-type rollup."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(12,6)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    bounds = stats.select(
        "event_type",
        "n",
        mean.alias("mean"),
        F.sqrt(
            F.greatest(F.col("ss") / F.col("n") - mean * mean, F.lit(0.0))
        ).alias("sd"),
    )
    flagged = F.abs(F.col("value") - F.col("mean")) > 3 * F.col("sd")
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value(F.col("n")).alias("n_events"),
            F.sum(F.when(flagged, 1).otherwise(0)).alias("n_anomalies"),
            F.min(F.when(flagged, F.col("event_id"))).alias("first_anomaly_id"),
        )
    )


# --- forward as-of join with tolerance -----------------------------------------


@register(
    "join_asof_forward",
    """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
matched AS (
  SELECT p.event_id, p.user_id, p.ts,
         min(CASE WHEN e.event_id IS NULL THEN NULL
                  ELSE struct_pack(t := e.ts, nid := -e.event_id) END) AS m
  FROM purchases p
  LEFT JOIN errors e
    ON p.user_id = e.user_id
   AND e.ts >= p.ts
   AND e.ts <= p.ts + INTERVAL 10 MINUTE
  GROUP BY p.event_id, p.user_id, p.ts
)
SELECT event_id, user_id, ts,
       m.t    AS asof_ts,
       -m.nid AS asof_event_id
FROM matched
""",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each purchase matched to the
    user's NEXT error event within 10 minutes (pandas
    ``merge_asof(direction='forward', tolerance=...)`` semantics) —
    e.g. "did a checkout error follow this purchase?".

    Same single-exchange union+window plan as the backward as-of
    (operators/joins.py asof_join, direction='forward'): the oracle's
    range join + argmin is what we deliberately do NOT execute at
    scale. Ties on (user, ts) resolve to the greatest payload struct
    (max event_id) on both sides."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("user_id"), F.col("ts"), F.col("event_id")
    )
    out = asof_join(
        purchases,
        errors,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
        how="left",
        direction="forward",
        tolerance=F.expr("INTERVAL 10 MINUTES"),
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "asof_ts",
        F.col("asof_event_id"),
    )

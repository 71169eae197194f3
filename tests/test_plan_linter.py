"""Plan linter: detects scale hazards, and the registry's headline batch
queries stay hazard-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.plans.linter import lint_plan
from ohlc_spark_streaming_spark.registry import QUERIES
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE

# Batch headline queries expected hazard-free (streaming queries execute on
# call, so they are exercised elsewhere; the faithful OHLC mode is the
# deliberate COLLECT_LIST witness).
CLEAN = [
    "ohlc_candles",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_asof_purchase_view",
    "dedup_exact",
    "text_tfidf",
    "window_rank_battery",
    "join_interval_overlap",
    "candle_trend_slope",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customers",
    # dedup_jaccard_ppjoin is NOT here: its verification collects per-doc
    # shingle SETS (bounded by document length, not group cardinality) —
    # same deliberate pattern as dedup_minhash_lsh, which the linter
    # rightly flags as a collect and we rightly accept.
    "pack_sequences",
    "vwap_candles",
    "twap_candles",
    "ohlc_rollup_candles",
    "cms_token_counts",
    # round 3 corpus hygiene (domain_mixture's only finding is the
    # 1-row-total NL_BROADCAST info, which is the intended scalar attach)
    "quality_repetition",
    "decontaminate_ngram",
    "domain_mixture",
    "text_lm_coverage",
    # round 5 additions (hierarchy rollup executes its closure eagerly,
    # so only the final rollup plan is lintable — included anyway).
    # embedding_quantize_int8 is NOT here: its collect_list builds the
    # per-dim [min,max] arrays from the DIMS table — bounded by the
    # embedding dimensionality, not by corpus size — the same
    # deliberate bounded-collect pattern as dedup_jaccard_ppjoin.
    "part_hierarchy_rollup",
    "cooc_lift_topk",
    "inverted_index_champions",
    "conjunctive_search",
    "approx_percentile_audit",
]


def test_clean_queries_have_no_findings(spark):
    for name in CLEAN:
        errors = [
            f for f in lint_plan(QUERIES[name](spark, SF_SMOKE))
            if f[0] == "error"
        ]
        assert not errors, (name, errors)


def test_linter_flags_cartesian(spark):
    a = load_table(spark, SF_SMOKE, "region")
    b = load_table(spark, SF_SMOKE, "nation")
    codes = {c for _, c, _ in lint_plan(a.crossJoin(b))}
    assert "CARTESIAN" in codes or "NL_BROADCAST" in codes


def test_linter_flags_collect_list(spark):
    df = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
    )
    codes = {c for _, c, _ in lint_plan(df)}
    assert "COLLECT_LIST" in codes


def test_linter_flags_faithful_ohlc(spark):
    """The reference's own collect_list formulation is exactly what the
    linter exists to catch (main.py:153-158)."""
    codes = {
        c for _, c, _ in lint_plan(QUERIES["ohlc_candles_faithful"](spark, SF_SMOKE))
    }
    assert "COLLECT_LIST" in codes


def test_linter_flags_row_python(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda s: (s or "").upper())
    df = load_table(spark, SF_SMOKE, "documents").select(slow(F.col("lang")))
    codes = {c for _, c, _ in lint_plan(df)}
    assert "ROW_PYTHON" in codes

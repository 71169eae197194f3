"""Count–min sketch guarantees: never an underestimate, bounded error."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.functions.hashing import rolling_hash
from ohlc_spark_streaming_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counters,
    cms_estimates,
)
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def test_cms_never_underestimates(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    occ = docs.select(F.explode(F.split("text", " ")).alias("token"))
    dic = F.broadcast(
        occ.select("token").distinct().withColumn("kh", rolling_hash("token"))
    )
    occh = occ.join(dic, "token").cache()
    counters = cms_counters(occh, hash_col="kh")

    # Grid size is capped by construction — the broadcast in cms_estimates
    # is always safe.
    assert counters.count() <= CMS_DEPTH * CMS_WIDTH

    exact = occh.groupBy("token", "kh").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimates(exact, counters, hash_col="kh")

    under = est.where(F.col("cms_count") < F.col("exact")).count()
    assert under == 0

    # Total stream length N bounds the error: estimate - exact <= N
    # trivially; check the useful bound holds on this corpus for the vast
    # majority of keys (width 1024 vs vocab ~ a few thousand).
    n_total = occ.count()
    bad = est.where(
        F.col("cms_count") - F.col("exact") > F.lit(2.0 * n_total / CMS_WIDTH)
    ).count()
    n_keys = est.count()
    assert bad <= n_keys * 0.05  # Markov bound leaves ample slack

"""Round-7 tranche B: attribution, seasonal anomaly, rolling actives,
target encoding, shard checksums, quota apportionment, simhash recall,
equi-depth fit/apply. Cross-engine equivalence is covered by the registry
oracle sweep (test_registry_oracle.py); these pin the SEMANTIC properties
the oracle comparison alone can't express."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

# Import the registry first: queries.analytics as the FIRST package import
# would re-enter itself partially initialized via registry's populate-on-
# import chain (queries/streaming.py pulls analytics' shared oracle).
import ohlc_spark_streaming_spark.registry  # noqa: F401

from ohlc_spark_streaming_spark.queries.analytics import (
    q_anomaly_seasonal_baseline,
    q_attribution_position,
    q_rolling_active_7d,
)
from ohlc_spark_streaming_spark.queries.llm import (
    q_quota_apportion,
    q_shard_checksum_manifest,
    q_simhash_recall_audit,
    q_target_encode_smoothed,
)
from ohlc_spark_streaming_spark.queries.relational import q_equidepth_bin_apply
from ohlc_spark_streaming_spark.functions import hashing
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def test_attribution_conserves_credit(spark):
    """Every converting user's journey hands out exactly 1.0 credit
    (up to the declared 1e-12 quantization), so total credit equals the
    number of users with >=1 touch before their first purchase."""
    rows = q_attribution_position(spark, SF_SMOKE).collect()
    assert rows
    e = load_table(spark, SF_SMOKE, "events")
    fp = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp_ts"))
    )
    journeys = (
        e.join(fp, "user_id")
        .where((F.col("ts") < F.col("fp_ts")) & (F.col("event_type") != "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    total_units = sum(r.credit_units for r in rows)
    # each journey may leave up to (n-2)/2 quantization units on the floor
    assert abs(total_units - journeys * 10**12) <= journeys * 10**6
    n_touches = sum(r.n_touches for r in rows)
    touch_rows = (
        e.join(fp, "user_id")
        .where((F.col("ts") < F.col("fp_ts")) & (F.col("event_type") != "purchase"))
        .count()
    )
    assert n_touches == touch_rows


def test_seasonal_anomaly_cells_partition_the_events(spark):
    rows = q_anomaly_seasonal_baseline(spark, SF_SMOKE).collect()
    assert rows
    total = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_events for r in rows) == total
    for r in rows:
        assert 0 <= r.n_anomalies <= r.n_events
        if r.n_anomalies == 0:
            assert r.first_anomaly_id is None


def test_rolling_active_7d_matches_bruteforce(spark):
    rows = {r.day: r.n_active for r in q_rolling_active_7d(spark, SF_SMOKE).collect()}
    assert rows
    acts = duckdb.connect().execute(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    by_user_days: set[tuple[int, dt.date]] = set(acts)
    days = sorted({d for _, d in by_user_days})
    lo, hi = days[0], days[-1]
    d = lo
    while d <= hi:
        expect = len(
            {
                u
                for (u, ad) in by_user_days
                if d - dt.timedelta(days=6) <= ad <= d
            }
        )
        assert rows[d] == expect, d
        d += dt.timedelta(days=1)
    # calendar is dense: one row per day, no gaps
    assert len(rows) == (hi - lo).days + 1


def test_target_encoding_shrinks_toward_prior(spark):
    rows = q_target_encode_smoothed(spark, SF_SMOKE).collect()
    assert rows
    n_tot = sum(r.n for r in rows)
    pos_tot = sum(r.pos for r in rows)
    prior = pos_tot / n_tot
    for r in rows:
        lo, hi = sorted((r.target_rate, prior))
        assert lo - 1e-12 <= r.enc_smoothed <= hi + 1e-12
        # more data -> closer to the raw rate than the prior-only estimate
        assert abs(r.enc_smoothed - r.target_rate) <= abs(prior - r.target_rate) + 1e-12


def test_shard_checksums_are_partition_order_independent(spark):
    out = {
        r.shard: r
        for r in q_shard_checksum_manifest(spark, SF_SMOKE).collect()
    }
    # recompute from a deliberately re-partitioned scan: commutative
    # checksums must not notice the layout change
    d = load_table(spark, SF_SMOKE, "documents").repartition(17)
    again = {
        r.shard: r
        for r in d.select(
            (F.col("doc_id") % 16).cast("long").alias("shard"),
            "doc_id",
            "n_chars",
            hashing.rolling_hash("text").alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("id_lo"),
            F.max("doc_id").alias("id_hi"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
            F.sum("h").cast("long").alias("checksum_sum"),
            F.bit_xor("h").cast("long").alias("checksum_xor"),
        )
        .collect()
    }
    assert set(out) == set(again)
    for s in out:
        assert out[s].checksum_sum == again[s].checksum_sum
        assert out[s].checksum_xor == again[s].checksum_xor
        assert out[s].n_docs == again[s].n_docs
    # a single flipped character must change the sum checksum
    mutated = d.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.concat(F.col("text"), F.lit("!"))).otherwise(
            F.col("text")
        ),
    )
    mut = (
        mutated.select(
            (F.col("doc_id") % 16).cast("long").alias("shard"),
            hashing.rolling_hash("text").alias("h"),
        )
        .groupBy("shard")
        .agg(F.sum("h").cast("long").alias("checksum_sum"))
        .where(F.col("shard") == 0)
        .collect()
    )
    assert mut[0].checksum_sum != out[0].checksum_sum


def test_quota_apportionment_is_exact_hamilton(spark):
    rows = q_quota_apportion(spark, SF_SMOKE).collect()
    assert rows
    budget = 10_007
    assert sum(r.quota for r in rows) == budget
    n_tot = sum(r.n_docs for r in rows)
    for r in rows:
        base = (budget * r.n_docs) // n_tot
        assert r.quota in (base, base + 1)


def test_simhash_recall_is_a_fraction_of_truth(spark):
    row = q_simhash_recall_audit(spark, SF_SMOKE).collect()[0]
    assert row.n_true > 0, "sf0.001 corpus should contain near-dup pairs"
    assert 0 <= row.n_found <= row.n_true
    assert abs(row.recall - row.n_found / row.n_true) < 1e-15


def test_equidepth_bins_partition_and_order(spark):
    rows = sorted(q_equidepth_bin_apply(spark, SF_SMOKE).collect(), key=lambda r: r.bin)
    assert {r.bin for r in rows} <= set(range(1, 11))
    n_lineitem = load_table(spark, SF_SMOKE, "lineitem").count()
    assert sum(r.n_rows for r in rows) == n_lineitem
    for a, b in zip(rows, rows[1:]):
        assert a.lo <= a.hi
        assert a.hi < b.lo  # strict-< boundary rule: no value straddles


def test_winsorize_bounds_and_means(spark):
    from ohlc_spark_streaming_spark.queries.relational import q_winsorize_clip

    row = q_winsorize_clip(spark, SF_SMOKE).collect()[0]
    assert row.p01 <= row.p99
    # rank-based percentiles clip at most ~1% per tail (ties can reduce it)
    assert row.n_clipped_lo <= row.n_rows * 0.011
    assert row.n_clipped_hi <= row.n_rows * 0.011
    # clipping pulls the mean toward the interior, never outside [p01, p99]
    assert row.p01 <= row.mean_clipped <= row.p99
    # and the clipped mean moves from the raw mean by a bounded amount
    assert abs(row.mean_clipped - row.mean_raw) <= abs(row.p99 - row.p01)


def test_group_split_has_no_user_leakage(spark):
    from ohlc_spark_streaming_spark.queries.llm import q_group_split_users

    rows = q_group_split_users(spark, SF_SMOKE).collect()
    e = load_table(spark, SF_SMOKE, "events")
    h = (F.col("user_id") * F.lit(2654435761)) % 100
    split = (
        F.when(h < 80, F.lit("train"))
        .when(h < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    crossing = (
        e.select("user_id", split.alias("split"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert crossing == 0
    assert sum(r.n_events for r in rows) == e.count()

"""Dedup-operator invariants beyond the registry oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ohlc_spark_streaming_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_ppjoin_pairs,
)
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def _as_set(df):
    return {(r.id_a, r.id_b, round(r.jaccard, 12)) for r in df.collect()}


def test_star_cc_handles_high_diameter_graphs(spark):
    """A 200-node path is the propagation worst case (diameter 199); star
    contraction must still collapse it to one component within its round
    budget, proving the log-rounds claim."""
    from ohlc_spark_streaming_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components_star(edges, nodes, max_iter=12).collect()
    }
    assert got == {(i, 0) for i in range(n)}

    # And on a multi-component graph both algorithms agree.
    edges2 = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 9), (9, 5)], ["id_a", "id_b"]
    )
    nodes2 = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    star = {
        (r.doc_id, r.cluster_id)
        for r in connected_components_star(edges2, nodes2).collect()
    }
    prop = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(edges2, nodes2).collect()
    }
    assert star == prop


def test_ppjoin_prefix_filter_is_lossless(spark):
    """The PPJoin prefix filter must not drop any qualifying pair: its
    output equals the UNFILTERED global count join (no blocks, no bands)
    at the same threshold."""
    docs = load_table(spark, SF_SMOKE, "documents")
    brute = jaccard_pairs(
        docs, block_cols=(), shingle_n=3, threshold=0.5, length_band=None
    )
    pp = jaccard_ppjoin_pairs(docs, threshold=0.5)
    assert _as_set(pp) == _as_set(brute)
    assert len(_as_set(pp)) > 0


def test_ppjoin_lossless_at_high_threshold(spark):
    """Same losslessness at a tighter threshold (shorter prefixes — the
    filter prunes harder and a boundary off-by-one would show here)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    brute = jaccard_pairs(
        docs, block_cols=(), shingle_n=3, threshold=0.9, length_band=None
    )
    pp = jaccard_ppjoin_pairs(docs, threshold=0.9)
    assert _as_set(pp) == _as_set(brute)


def test_shingle_sets_equals_grouped_shingle_hashes(spark):
    """shingle_sets (array-side derivation, one shuffle) must equal the
    row-level shingle_hashes(...).groupBy(id).collect_set pipeline it
    replaced — the direct parity assertion its docstring promises."""
    from ohlc_spark_streaming_spark.operators.dedup import (
        shingle_hashes,
        shingle_sets,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    fast = {
        r.doc_id: sorted(r.units)
        for r in shingle_sets(docs).collect()
    }
    slow = {
        r.doc_id: sorted(r.units)
        for r in (
            shingle_hashes(docs)
            .groupBy("doc_id")
            .agg(F.collect_set("sh").alias("units"))
            .collect()
        )
    }
    assert fast == slow
    assert fast, "empty corpus would vacuously pass"


def test_incremental_probe_equals_full_lsh_cross_pairs(spark):
    """The asymmetric new-vs-corpus probe must find EXACTLY the full
    LSH pair list restricted to cross-side pairs — incrementality may
    not lose or invent matches."""
    from ohlc_spark_streaming_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_probe_pairs,
        shingle_sets,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    full = {
        (r.id_a, r.id_b, round(r.jaccard, 12))
        for r in minhash_lsh_pairs(docs, threshold=0.7).collect()
        if (r.id_a % 10 == 0) != (r.id_b % 10 == 0)
    }
    sets = shingle_sets(docs).persist()
    probe = minhash_probe_pairs(
        sets.where("doc_id % 10 = 0"),
        sets.where("doc_id % 10 != 0"),
        threshold=0.7,
    )
    got = {
        (min(r.new_id, r.corpus_id), max(r.new_id, r.corpus_id),
         round(r.jaccard, 12))
        for r in probe.collect()
    }
    assert got == full
    assert len(got) > 0


def test_minhash_pairs_invariant_under_exact_duplication(spark):
    """Metamorphic duplication-invariance — the CORRECTNESS side of the
    SCALE.md timing claim: injecting exact copies of existing documents
    (fresh ids, identical text) must not change the near-dup pair set
    restricted to the original ids, and every injected copy must pair
    with its source's group. If the identical-set collapse ever leaked
    duplicates into candidate generation, extra bucket collisions could
    only be masked by luck — this asserts the semantics directly."""
    from pyspark.sql import functions as F

    from ohlc_spark_streaming_spark.operators.dedup import minhash_lsh_pairs
    from ohlc_spark_streaming_spark.sources.batch import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    base_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, threshold=0.7).collect()
    }

    offset = 10_000_000
    copies = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + offset).alias("doc_id"), "text"
    )
    dup_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs.unionByName(copies), threshold=0.7).collect()
    }

    restricted = {
        (a, b) for a, b in dup_pairs if a < offset and b < offset
    }
    assert restricted == base_pairs
    # every copy must be paired with its identical source (Jaccard 1.0)
    copied_ids = {r.doc_id for r in copies.collect()}
    for cid in copied_ids:
        src = cid - offset
        assert (min(src, cid), max(src, cid)) in dup_pairs


def test_shingle_profiles_equals_sets_plus_fingerprints(spark):
    """shingle_profiles (one pass: units + in-row simhash votes) must be
    bit-identical to the shingle_sets and simhash_fingerprints pipelines
    it fuses — the parity assertion its docstring promises."""
    from ohlc_spark_streaming_spark.operators.dedup import (
        shingle_profiles,
        shingle_sets,
        simhash_fingerprints,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    prof = {
        r.doc_id: (sorted(r.units), r.n_units, r.simhash)
        for r in shingle_profiles(docs).collect()
    }
    sets = {
        r.doc_id: (sorted(r.units), r.n_units)
        for r in shingle_sets(docs).collect()
    }
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert set(prof) == set(sets) == set(fps)
    assert prof, "empty corpus would vacuously pass"
    for k, (units, n_units, sim) in prof.items():
        assert (units, n_units) == sets[k], k
        assert sim == fps[k], k


def test_shingle_units_expr_equals_shingle_sets(spark):
    """shingle_units_expr (narrow, per-row — the streaming ingest twin)
    must produce the SAME distinct unit set per document as shingle_sets
    (dictionary-encoded batch path) — the direct parity assertion its
    docstring promises (ADVICE r9; previously only pinned end-to-end via
    test_streaming_neardup's batch-parity checks)."""
    from ohlc_spark_streaming_spark.operators.dedup import (
        shingle_sets,
        shingle_units_expr,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    narrow = {
        r.doc_id: sorted(r.units)
        for r in docs.select(
            "doc_id", shingle_units_expr("text").alias("units")
        ).collect()
        if r.units
    }
    batch = {
        r.doc_id: sorted(r.units) for r in shingle_sets(docs).collect()
    }
    assert narrow == batch
    assert narrow, "empty corpus would vacuously pass"

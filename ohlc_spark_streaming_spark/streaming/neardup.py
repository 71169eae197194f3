"""Streaming MinHash-LSH near-duplicate detection — dedup at the door.

The batch near-dup program (operators/dedup.py::minhash_lsh_pairs) runs
over a corpus at rest; a production 100 TB ingest pipeline wants the same
decision as documents ARRIVE, against everything already ingested. This
module is that operator, Spark-first (SURVEY.md §2.11 extension; the
reference has no dedup of any kind):

1. **Narrow per-document hashing** (:func:`lsh_band_rows`): shingle-unit
   set, content fingerprint, MinHash signature, and band bucket keys are
   all computed inside the row (``shingle_units_expr`` — zero shuffles),
   because nothing may aggregate upstream of a stateful operator.
2. **Stateful band buckets** (:func:`tws_lsh_candidates`): a
   ``transformWithStateInPandas`` processor keyed by ``(band, key)`` with
   a typed ``MapState[fp → first_seen]``. A new distinct content
   fingerprint pairs against every fingerprint already in the bucket and
   joins the state; an IDENTICAL copy (fingerprint already present) adds
   **zero state and zero candidates** — the identical-set collapse of the
   batch operator (operators/dedup.py::_set_groups) replicated INSIDE
   bucket state, which is what keeps k-fold duplicated corpora from
   emitting k² bucket pairs (the 10× duplication sweep constraint).
3. **Batch-side verification** (:func:`neardup_finalize`): the candidate
   fingerprint pairs — a bounded, collapsed set — are verified with exact
   shingle-set Jaccard against the identical-set group table and expanded
   to document pairs, reusing the batch kernels verbatim. On a bounded
   replay the candidate set equals the batch LSH candidate set, so
   ``dedup_minhash_lsh``'s oracle applies verbatim.

Scale: bucket state holds one entry per DISTINCT content per band bucket
(LSH buckets are small by construction — that is what makes LSH sub-
quadratic); candidates are emitted once per co-bucketing, deduplicated
downstream. At 100 TB the finalize stage joins against the checkpointed
group table the ingest pipeline maintains anyway, instead of recomputing
shingle sets; here the bounded replay recomputes them from the static
table, which is the same join shape.

Runtime requirements: RocksDB state-store provider + ``google.protobuf``
in the workers — registry callers go through queries/streaming.py::_run_tws
(see streaming/stateful.py for the environment notes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _expand_group_pairs,
    _jaccard,
    _persist_tracked,
    _set_groups,
    _signature_cols,
    content_fp,
    shingle_sets,
    shingle_units_expr,
)
from ..functions.hashing import BAND_ROWS, N_BANDS, band_key


def lsh_band_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Narrow per-document band-bucket rows: ``(band, key, fp)``.

    One output row per (document, band). Everything is in-row — tokens →
    rolling hashes → shingle set → fingerprint → MinHash signature → band
    keys — so this projection is legal upstream of a stateful operator
    and costs zero shuffles. Documents too short to shingle (empty unit
    set) are dropped, mirroring the batch operator.
    """
    with_units = docs.select(
        F.col(id_col), F.sort_array(shingle_units_expr(text_col)).alias("units")
    ).where(F.size("units") > 0)
    sig = with_units.select(
        F.col(id_col),
        content_fp("units").alias("fp"),
        *_signature_cols(F.col("units")),
    )
    return sig.select(
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        band_key(
                            F.col(f"mh{j * BAND_ROWS}"),
                            F.col(f"mh{j * BAND_ROWS + 1}"),
                        ).alias("key"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "fp")


def _bucket_emit(fps: list[str], known: set[str]) -> tuple[list[tuple], set]:
    """Pure candidate kernel for one bucket micro-batch: pair each NEW
    distinct fingerprint against everything already known (state +
    earlier-in-batch), normalized (fp_a < fp_b). Returns (pairs,
    additions). Identical copies (fp already known) emit nothing — the
    in-state identical-set collapse."""
    pairs: list[tuple] = []
    added: set[str] = set()
    for fp in fps:
        if fp in known or fp in added:
            continue
        for other in known:
            pairs.append((min(fp, other), max(fp, other)))
        for other in added:
            pairs.append((min(fp, other), max(fp, other)))
        added.add(fp)
    return pairs, added


def tws_lsh_candidates(band_rows: DataFrame) -> DataFrame:
    """Stateful LSH band buckets: emits candidate content-fingerprint
    pairs the first time two DISTINCT contents cohabit a bucket.

    ``transformWithStateInPandas`` keyed by ``(band, key)`` with
    ``MapState[fp → first-sighting marker]`` — the typed-state structure
    the legacy applyInPandasWithState API cannot express (its state is
    one fixed-width struct; a bucket's membership SET would have to be
    packed into an array column and rewritten wholesale every batch,
    while MapState point-reads/point-writes individual members). Each
    unordered pair of distinct co-bucketed contents is emitted exactly
    once per bucket — when the later one arrives — so the emission log,
    deduplicated across bands, equals the batch candidate set on a
    bounded replay regardless of how the input was split into
    micro-batches.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _BandBucket(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getMapState("seen", "fp string", "one long")

        def handleInputRows(self, key, rows, timerValues):
            known = {k[0] for k in self._seen.keys()}
            fps: list[str] = []
            for pdf in rows:
                fps.extend(pdf["fp"].tolist())
            pairs, added = _bucket_emit(fps, known)
            for fp in added:
                self._seen.updateValue((fp,), (1,))
            if pairs:
                yield pd.DataFrame(pairs, columns=["fp_a", "fp_b"])
            else:
                yield pd.DataFrame(
                    {
                        "fp_a": pd.Series([], dtype=object),
                        "fp_b": pd.Series([], dtype=object),
                    }
                )

        def close(self) -> None:
            pass

    return band_rows.groupBy("band", "key").transformWithStateInPandas(
        statefulProcessor=_BandBucket(),
        outputStructType="fp_a string, fp_b string",
        outputMode="Append",
        timeMode="None",
    )


def neardup_finalize(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> DataFrame:
    """Verify streamed candidate fingerprint pairs with exact shingle-set
    Jaccard and expand to document pairs — the batch tail of the ingest
    pipeline, reusing operators/dedup.py's kernels.

    ``candidates`` is the (bounded, content-collapsed) emission log of
    :func:`tws_lsh_candidates`; ``docs`` is the document table the stream
    replayed (at 100 TB: the maintained group/fingerprint table, same
    join shape). Output: (id_a, id_b, jaccard) — identical to
    minhash_lsh_pairs by construction, including within-group J=1.0
    pairs for identical documents.
    """
    groups = _persist_tracked(
        _set_groups(shingle_sets(docs, id_col, text_col), id_col).withColumn(
            "fp", content_fp("units")
        )
    )
    cand = candidates.select("fp_a", "fp_b").distinct()
    jac = _jaccard(
        F.col("a_units"), F.col("b_units"), F.col("a_n"), F.col("b_n")
    )
    rep_pairs = (
        cand.join(
            groups.select(
                F.col("fp").alias("fp_a"),
                F.col("rep").alias("rep_a"),
                F.col("units").alias("a_units"),
                F.col("n_units").alias("a_n"),
            ),
            "fp_a",
        )
        .join(
            groups.select(
                F.col("fp").alias("fp_b"),
                F.col("rep").alias("rep_b"),
                F.col("units").alias("b_units"),
                F.col("n_units").alias("b_n"),
            ),
            "fp_b",
        )
        .select("rep_a", "rep_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    return _expand_group_pairs(rep_pairs, groups)

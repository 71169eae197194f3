"""ANN oracle builders: the DuckDB CTE chains replaying trained /
residual IVF-PQ training, encoding, multi-probe ADC search, recall
yardsticks, and the SemDeDup cell rule.

Standalone on purpose: both ``queries/llm.py`` (the batch ANN family)
and ``queries/streaming.py`` (the serving twin) consume these builders
at registration time, and a cross-import between those two modules is a
circular-import landmine (the registry imports llm before streaming, so
an llm-first direct import left streaming's llm names partially
initialized — caught by tests/test_corpus_hygiene.py's import order).
This module imports nothing from the package at module scope (the
k-means‖ builder takes ``functions.hashing.P`` via a function-level
import — ``functions`` never imports ``queries``, so no cycle).

Determinism: every double op (squared-L2 folds, IEEE residual
subtraction, 1e-12-integer-unit centroid means, 1e-9-unit LUT floors)
is the exact expression tree the Spark operators run — bitwise
cross-engine (see operators/similarity.py and functions/vectorops.py).
"""

from __future__ import annotations

#: Residual index iteration count — measured, not guessed: on the
#: structure-free synthetic corpus, residual recall@5 vs exact L2 is
#: 0.24 at iters=2 but 0.34 at iters=3 (sf0.001; 0.32/0.34 at sf0.01),
#: clearing trained-raw at equal iters (0.26) AND the registered
#: trained-raw config's 0.30 — residual encoding needs the coarse
#: quantizer settled before the residual distribution is worth fitting.
#: Defined here, ABOVE the builders, so ``_ivfpq_residual_ctes``'s
#: default can reference it — the recall/staleness oracles that rely on
#: the default stay in lockstep with Spark twins that pass it
#: explicitly (r12 ADVICE).
_RES_ITERS = 3


def _ivfpq_trained_ctes(
    iters: int = 2,
    nprobe: int = 2,
    n_cents: int = 8,
    n_subspaces: int = 8,
    sub_d: int = 8,
    n_queries: int = 10,
) -> list[str]:
    """Shared CTE chain replaying trained IVF-PQ in DuckDB, through the
    ``adc`` relation: BOTH Lloyd trainings (coarse full-vector cells and
    per-subspace PQ codebooks, ``iters`` unrolled CTE layers each — the
    fixed-iteration pattern pagerank_copurchase uses), then the
    nprobe-cell multi-probe ADC scores. Mean updates sum exact
    floor(x·1e12 + 0.5) integer units in DECIMAL(38,0) (the
    kmeans_update_step discipline) so the trained centroid doubles are
    bit-identical to Spark's; emptied centroids keep their seats via
    the same LEFT JOIN + coalesce guard. ONE definition feeds both the
    similarity_ivfpq_trained oracle and the ann_recall_report oracle —
    the recall yardstick replays the same trained index it audits."""
    # Every knob the Spark twin exposes (dim = n_subspaces·sub_d,
    # n_subspaces, n_queries) threads through here (r11 ADVICE) — the
    # one-definition claim holds for all parameters, not just
    # iters/nprobe/n_cents.
    slc = f"list_slice(e, s*{sub_d} + 1, s*{sub_d} + {sub_d})"
    parts = [
        "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, e AS cv FROM d WHERE vec_id < {n_cents})",
        f"sgrid AS (SELECT unnest(range(0, {n_subspaces})) AS s)",
        f"sd AS (SELECT vec_id, s, {slc} AS sv FROM d, sgrid)",
        f"k0 AS (SELECT s, vec_id AS cid, sv AS cv FROM sd WHERE vec_id < {n_cents})",
    ]
    parts += _lloyd_coarse_parts(iters)
    parts += _lloyd_sub_parts(iters, src="sd", pfx="")
    parts += [
        f"""celld AS (
  SELECT d.vec_id, c.cid, {_SQ.format(a="d.e", b="c.cv")} AS dist
  FROM d CROSS JOIN c{iters} c
)""",
        """cells AS (
  SELECT vec_id, (min(struct_pack(d := dist, c := cid))).c AS cell
  FROM celld GROUP BY vec_id
)""",
        f"""qc AS (
  SELECT vec_id AS query_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cid ASC) AS probe
    FROM celld WHERE vec_id < {n_queries}
  ) WHERE probe <= {nprobe}
)""",
        f"""fdists AS (
  SELECT sd.vec_id, sd.s, k.cid, {_SQ.format(a="sd.sv", b="k.cv")} AS dist
  FROM sd JOIN k{iters} k ON sd.s = k.s
)""",
        """codes AS (
  SELECT vec_id, s, (min(struct_pack(d := dist, c := cid))).c AS c
  FROM fdists GROUP BY vec_id, s
)""",
        f"""lut AS (
  SELECT vec_id AS query_id, s, cid AS c,
         CAST(floor(dist * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS d_units
  FROM fdists WHERE vec_id < {n_queries}
)""",
        """adc AS (
  SELECT l.query_id, co.vec_id, CAST(sum(l.d_units) AS BIGINT) AS adc_units
  FROM codes co
  JOIN cells ce ON co.vec_id = ce.vec_id
  JOIN qc ON qc.cell = ce.cell
  JOIN lut l ON l.query_id = qc.query_id AND l.s = co.s AND l.c = co.c
  WHERE co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id
)""",
    ]
    return parts


#: Squared-L2 over two DOUBLE[] lists — the one distance expression every
#: ANN oracle CTE shares (identical double-op tree to vectorops.sqdist).
_SQ = "list_sum(list_transform(list_zip({a}, {b}), x -> (x[1]-x[2])*(x[1]-x[2])))"
#: Exact integer-unit per-dimension mean (the kmeans_update_step /
#: lloyd_train discipline) — bit-identical centroids cross-engine.
_QMEAN = (
    "CAST(SUM(CAST(floor(u.v * 1e12 + CAST(0.5 AS DOUBLE)) "
    "AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / count(*)"
)
#: Residual: elementwise e − centroid (IEEE subtraction, matches
#: vectorops.vdiff bitwise).
_VDIFF = "list_transform(list_zip({a}, {b}), x -> x[1] - x[2])"


def _lloyd_coarse_parts(
    iters: int, src: str = "d", pfx: str = ""
) -> list[str]:
    """``iters`` unrolled coarse Lloyd iterations over relation ``src``
    (vec_id, e) seeded by ``{pfx}c0``: {pfx}a{i} assign →
    {pfx}u{i}/{pfx}n{i} exact-unit means → {pfx}c{i} coalesce guard.
    Shared by the trained-raw and the residual oracle chains — one
    definition of coarse training. ``src`` lets the append-audit oracle
    train on the base slice only; ``pfx`` lets the k-means‖ audit run a
    second, independently-seeded chain next to the first-k one."""
    parts: list[str] = []
    for i in range(1, iters + 1):
        p = i - 1
        parts += [
            f"""{pfx}a{i} AS (
  SELECT vec_id, (min(struct_pack(d := dist, c := cid))).c AS cell FROM (
    SELECT {src}.vec_id, c.cid, {_SQ.format(a=f"{src}.e", b="c.cv")} AS dist
    FROM {src} CROSS JOIN {pfx}c{p} c
  ) GROUP BY vec_id
)""",
            f"""{pfx}u{i} AS (
  SELECT cell, u.i AS dim, {_QMEAN} AS nc
  FROM (SELECT vec_id,
               unnest(list_transform(e, (x, i) -> {{'i': i, 'v': x}})) AS u
        FROM {src}) t
  JOIN {pfx}a{i} USING (vec_id) GROUP BY cell, u.i
)""",
            f"{pfx}n{i} AS (SELECT cell AS cid, list(nc ORDER BY dim) AS cv "
            f"FROM {pfx}u{i} GROUP BY cell)",
            f"{pfx}c{i} AS (SELECT c.cid, coalesce(n.cv, c.cv) AS cv "
            f"FROM {pfx}c{p} c LEFT JOIN {pfx}n{i} n USING (cid))",
        ]
    return parts


def _lloyd_sub_parts(iters: int, src: str, pfx: str) -> list[str]:
    """``iters`` unrolled per-subspace Lloyd iterations over relation
    ``src`` (vec_id, s, sv) seeded by ``{pfx}k0``: {pfx}b{i} assign →
    {pfx}v{i}/{pfx}m{i} exact-unit means → {pfx}k{i} coalesce guard.
    ``pfx=''`` trains on raw subvectors (trained chain); ``pfx='r'``
    on residual subvectors (residual chain) — same machinery, one
    definition."""
    parts: list[str] = []
    for i in range(1, iters + 1):
        p = i - 1
        parts += [
            f"""{pfx}b{i} AS (
  SELECT vec_id, s, (min(struct_pack(d := dist, c := cid))).c AS cell FROM (
    SELECT {src}.vec_id, {src}.s, k.cid, {_SQ.format(a=f"{src}.sv", b="k.cv")} AS dist
    FROM {src} JOIN {pfx}k{p} k ON {src}.s = k.s
  ) GROUP BY vec_id, s
)""",
            f"""{pfx}v{i} AS (
  SELECT s, cell, u.i AS dim, {_QMEAN} AS nc
  FROM (SELECT vec_id, s,
               unnest(list_transform(sv, (x, i) -> {{'i': i, 'v': x}})) AS u
        FROM {src}) t
  JOIN {pfx}b{i} USING (vec_id, s) GROUP BY s, cell, u.i
)""",
            f"{pfx}m{i} AS (SELECT s, cell AS cid, list(nc ORDER BY dim) AS cv "
            f"FROM {pfx}v{i} GROUP BY s, cell)",
            f"{pfx}k{i} AS (SELECT k.s, k.cid, coalesce(m.cv, k.cv) AS cv "
            f"FROM {pfx}k{p} k LEFT JOIN {pfx}m{i} m "
            f"ON k.s = m.s AND k.cid = m.cid)",
        ]
    return parts


def _materialize(parts: list[str]) -> list[str]:
    """Mark every CTE ``AS MATERIALIZED``: DuckDB inlines CTEs at each
    reference site, and the residual chain references its trained
    relations (c{i}, cells, rk{i}) from several downstream CTEs — the
    inlined expansion re-runs the whole unrolled training per reference
    (measured: 187s vs 1.4s at sf0.001). Materialization restores the
    evaluate-once semantics the Spark twin has by construction."""
    return [p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts]


def _ivfpq_residual_ctes(
    iters: int = _RES_ITERS,
    nprobe: int = 2,
    n_cents: int = 8,
    n_subspaces: int = 8,
    sub_d: int = 8,
    n_queries: int = 10,
    train_filter: str | None = None,
) -> list[str]:
    """CTE chain replaying RESIDUAL-encoded trained IVF-PQ in DuckDB,
    through the ``adc`` relation (VERDICT r11 item 1 — FAISS IVFADC's
    default encoding): coarse Lloyd training (shared
    :func:`_lloyd_coarse_parts`), final cell assignment, then the PQ
    sub-codebooks trained on RESIDUALS ``v − centroid(cell(v))``
    (shared :func:`_lloyd_sub_parts` over the residual relation), codes
    on residuals, and a per-(query, probed cell) LUT — residual
    encoding makes the query's LUT cell-dependent, because the query's
    own residual differs per probed cell. Every double op (subtraction,
    squared-L2, integer-unit means and LUT floors) is the exact
    expression tree the Spark operator runs — bitwise cross-engine.

    ``train_filter`` (a WHERE predicate over vec_id) restricts BOTH
    trainings to a base slice while assignment/encoding/search stay
    full-corpus — the append-audit oracle: frozen-index encode over the
    grown corpus, which by determinism equals train-on-base +
    incremental append (the two-phase pytest pins the equivalence on
    the Spark side)."""
    slc = f"list_slice(e, s*{sub_d} + 1, s*{sub_d} + {sub_d})"
    train = "d" if train_filter is None else "db"
    rtrain = "rsd" if train_filter is None else "rsdb"
    parts = [
        "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
    ]
    if train_filter is not None:
        parts.append(f"db AS (SELECT * FROM d WHERE {train_filter})")
    parts += [
        f"c0 AS (SELECT vec_id AS cid, e AS cv "
        f"FROM {train} WHERE vec_id < {n_cents})",
        f"sgrid AS (SELECT unnest(range(0, {n_subspaces})) AS s)",
    ]
    parts += _lloyd_coarse_parts(iters, src=train)
    parts += [
        f"""celld AS (
  SELECT d.vec_id, c.cid, {_SQ.format(a="d.e", b="c.cv")} AS dist
  FROM d CROSS JOIN c{iters} c
)""",
        """cells AS (
  SELECT vec_id, (min(struct_pack(d := dist, c := cid))).c AS cell
  FROM celld GROUP BY vec_id
)""",
        f"""qc AS (
  SELECT vec_id AS query_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cid ASC) AS probe
    FROM celld WHERE vec_id < {n_queries}
  ) WHERE probe <= {nprobe}
)""",
        # Residual relation: every vector minus its assigned centroid.
        f"""rd AS (
  SELECT d.vec_id, {_VDIFF.format(a="d.e", b="c.cv")} AS e
  FROM d JOIN cells ce ON d.vec_id = ce.vec_id
  JOIN c{iters} c ON c.cid = ce.cell
)""",
        f"rsd AS (SELECT vec_id, s, {slc} AS sv FROM rd, sgrid)",
    ]
    if train_filter is not None:
        parts.append(f"rsdb AS (SELECT * FROM rsd WHERE {train_filter})")
    parts += [
        f"rk0 AS (SELECT s, vec_id AS cid, sv AS cv "
        f"FROM {rtrain} WHERE vec_id < {n_cents})",
    ]
    parts += _lloyd_sub_parts(iters, src=rtrain, pfx="r")
    parts += [
        f"""rdists AS (
  SELECT rsd.vec_id, rsd.s, k.cid, {_SQ.format(a="rsd.sv", b="k.cv")} AS dist
  FROM rsd JOIN rk{iters} k ON rsd.s = k.s
)""",
        """codes AS (
  SELECT vec_id, s, (min(struct_pack(d := dist, c := cid))).c AS c
  FROM rdists GROUP BY vec_id, s
)""",
        # Query residual PER PROBED CELL (the residual-ADC signature).
        f"""qr AS (
  SELECT qc.query_id, qc.cell, {_VDIFF.format(a="d.e", b="c.cv")} AS e
  FROM qc JOIN d ON d.vec_id = qc.query_id
  JOIN c{iters} c ON c.cid = qc.cell
)""",
        f"qrs AS (SELECT query_id, cell, s, {slc} AS sv FROM qr, sgrid)",
        f"""lut AS (
  SELECT qrs.query_id, qrs.cell, qrs.s, k.cid AS c,
         CAST(floor({_SQ.format(a="qrs.sv", b="k.cv")} * 1e9
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS d_units
  FROM qrs JOIN rk{iters} k ON qrs.s = k.s
)""",
        """adc AS (
  SELECT l.query_id, co.vec_id, CAST(sum(l.d_units) AS BIGINT) AS adc_units
  FROM codes co
  JOIN cells ce ON co.vec_id = ce.vec_id
  JOIN lut l ON l.cell = ce.cell AND l.s = co.s AND l.c = co.c
  WHERE co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id
)""",
    ]
    return _materialize(parts)


def _ivfpq_trained_oracle(
    iters: int = 2,
    nprobe: int = 2,
    n_cents: int = 8,
    k: int = 5,
    n_subspaces: int = 8,
    sub_d: int = 8,
    n_queries: int = 10,
) -> str:
    """similarity_ivfpq_trained's oracle: the shared trained-index CTE
    chain + the top-k cut."""
    return (
        ",\n".join(
            _ivfpq_trained_ctes(
                iters, nprobe, n_cents, n_subspaces, sub_d, n_queries
            )
        )
        + f"""
SELECT query_id, vec_id, adc_units, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_units ASC, vec_id ASC) AS rank
  FROM adc
) WHERE rank <= {k}
"""
    )


def _ann_recall_oracle(k: int = 5, n_queries: int = 10) -> str:
    """ann_recall_report's oracle: the shared trained-index CTE chain,
    an exact squared-L2 top-k yardstick over the same probe queries,
    and the per-query overlap count."""
    return (
        ",\n".join(_ivfpq_trained_ctes(n_queries=n_queries))
        + f""",
exactd AS (
  SELECT q.vec_id AS query_id, d.vec_id,
         list_sum(list_transform(list_zip(d.e, q.e),
                                 x -> (x[1]-x[2])*(x[1]-x[2]))) AS d2
  FROM d CROSS JOIN d q
  WHERE q.vec_id < {n_queries} AND d.vec_id <> q.vec_id
),
exacttop AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY d2 ASC, vec_id ASC) AS r
    FROM exactd
  ) WHERE r <= {k}
),
approxtop AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_units ASC, vec_id ASC) AS r
    FROM adc
  ) WHERE r <= {k}
)
SELECT e.query_id,
       CAST(count(a.vec_id) AS BIGINT)  AS n_hits,
       CAST({k} AS BIGINT)              AS k,
       CAST(count(a.vec_id) AS DOUBLE) / CAST({k} AS DOUBLE) AS recall
FROM exacttop e
LEFT JOIN approxtop a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id
"""
    )


_ANN_TOPK_CUT = """
SELECT query_id, vec_id, adc_units, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_units ASC, vec_id ASC) AS rank
  FROM adc
) WHERE rank <= {k}
"""


def _ivfpq_residual_oracle(
    iters: int = _RES_ITERS,
    nprobe: int = 2,
    k: int = 5,
    train_filter: str | None = None,
) -> str:
    """similarity_ivfpq_residual's oracle (and, with ``train_filter``,
    ann_index_append_audit's): the residual CTE chain + the top-k cut."""
    return ",\n".join(
        _ivfpq_residual_ctes(iters=iters, nprobe=nprobe, train_filter=train_filter)
    ) + _ANN_TOPK_CUT.format(k=k)


def _refine_parts(k: int = 5, refine_factor: int = 4) -> list[str]:
    """Refine re-rank CTEs (VERDICT r12 item 2 — FAISS
    ``IndexRefineFlat``): the top ``refine_factor·k`` ADC candidates per
    query, re-scored by EXACT squared-L2 on the raw vectors fetched for
    only those ids, in 1e-9 integer units (the LUT discipline) — the
    exact expression tree the Spark operator
    (``ann_index_search_refined``) runs. Appended after any chain that
    defines ``d`` and ``adc``."""
    shortlist = refine_factor * k
    return [
        f"""cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_units ASC, vec_id ASC) AS r
    FROM adc
  ) WHERE r <= {shortlist}
)""",
        f"""refined AS (
  SELECT c.query_id, c.vec_id,
         CAST(floor({_SQ.format(a="d.e", b="q.e")} * 1e9
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS exact_units
  FROM cand c
  JOIN d ON d.vec_id = c.vec_id
  JOIN d q ON q.vec_id = c.query_id
)""",
    ]


_ANN_REFINE_CUT = """
SELECT query_id, vec_id, exact_units, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY exact_units ASC, vec_id ASC) AS rank
  FROM refined
) WHERE rank <= {k}
"""


def _ivfpq_refine_oracle(
    iters: int = _RES_ITERS,
    nprobe: int = 2,
    k: int = 5,
    refine_factor: int = 4,
) -> str:
    """similarity_ivfpq_refine's oracle: the residual chain, the
    refine re-rank CTEs, and the top-k cut by exact units."""
    parts = _ivfpq_residual_ctes(iters=iters, nprobe=nprobe) + _materialize(
        _refine_parts(k=k, refine_factor=refine_factor)
    )
    return ",\n".join(parts) + _ANN_REFINE_CUT.format(k=k)


_ANN_FILTER_CUT = """
SELECT query_id, vec_id, adc_units, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_units ASC, vec_id ASC) AS rank
  FROM fadc
) WHERE rank <= {k}
"""


def _ivfpq_filtered_oracle(
    iters: int = _RES_ITERS,
    nprobe: int = 2,
    k: int = 5,
    n_queries: int = 10,
) -> str:
    """ann_search_filtered's oracle: the residual chain, then the
    per-query label predicate applied to the candidate relation BEFORE
    the top-k cut (pre-filtering — the rank runs over surviving
    candidates only, so every returned slot satisfies the filter; a
    post-hoc filter of the unfiltered top-k would return fewer rows).
    Per-candidate ADC sums are independent, so filtering the ``adc``
    relation is value-identical to the Spark side's inverted-list-scan
    filter."""
    parts = _ivfpq_residual_ctes(iters=iters, nprobe=nprobe) + _materialize(
        [
            f"qa AS (SELECT vec_id AS query_id, label AS qattr "
            f"FROM embeddings WHERE vec_id < {n_queries})",
            "ca AS (SELECT vec_id, label AS cattr FROM embeddings)",
            """fadc AS (
  SELECT a.query_id, a.vec_id, a.adc_units
  FROM adc a
  JOIN qa ON a.query_id = qa.query_id
  JOIN ca ON a.vec_id = ca.vec_id
  WHERE ca.cattr = qa.qattr
)""",
        ]
    )
    return ",\n".join(parts) + _ANN_FILTER_CUT.format(k=k)


def _ann_recall_refine_oracle(
    k: int = 5,
    n_queries: int = 10,
    refine_factor: int = 4,
) -> str:
    """ann_recall_refine's oracle: the residual chain + refine CTEs,
    the exact yardstick, and the per-query overlap of the REFINED
    top-k — the refine-vs-residual lift is the difference between two
    driver-hash-checked results (the ann_recall_residual pattern)."""
    parts = _ivfpq_residual_ctes(n_queries=n_queries) + _materialize(
        _refine_parts(k=k, refine_factor=refine_factor)
    )
    return ",\n".join(parts) + _recall_tail(
        k, n_queries, approx_src="refined", order_col="exact_units"
    )


def _recall_tail(
    k: int,
    n_queries: int,
    approx_src: str = "adc",
    order_col: str = "adc_units",
) -> str:
    """Shared recall@k tail: exact squared-L2 yardstick CTEs over the
    probe queries, the index's top-k (from ``approx_src`` ordered by
    ``order_col``), and the per-query overlap count — appended after
    any chain that defines ``d`` and ``approx_src``."""
    return f""",
exactd AS (
  SELECT q.vec_id AS query_id, d.vec_id,
         {_SQ.format(a="d.e", b="q.e")} AS d2
  FROM d CROSS JOIN d q
  WHERE q.vec_id < {n_queries} AND d.vec_id <> q.vec_id
),
exacttop AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY d2 ASC, vec_id ASC) AS r
    FROM exactd
  ) WHERE r <= {k}
),
approxtop AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {order_col} ASC, vec_id ASC) AS r
    FROM {approx_src}
  ) WHERE r <= {k}
)
SELECT e.query_id,
       CAST(count(a.vec_id) AS BIGINT)  AS n_hits,
       CAST({k} AS BIGINT)              AS k,
       CAST(count(a.vec_id) AS DOUBLE) / CAST({k} AS DOUBLE) AS recall
FROM exacttop e
LEFT JOIN approxtop a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id
"""


def _ann_recall_residual_oracle(k: int = 5, n_queries: int = 10) -> str:
    """ann_recall_residual's oracle: the residual trained-index chain,
    the same exact squared-L2 yardstick as ann_recall_report, and the
    per-query overlap count — the residual-vs-trained-raw recall lift
    is the difference between two driver-hash-checked results."""
    return ",\n".join(
        _ivfpq_residual_ctes(n_queries=n_queries)
    ) + _recall_tail(k, n_queries)


def _ann_staleness_oracle(k: int = 5, n_queries: int = 10) -> str:
    """ann_index_staleness' oracle: recall@k of the FROZEN base-trained
    index serving the GROWN corpus (the append-audit chain) against the
    exact yardstick over that grown corpus. The STALENESS DELTA — how
    much serving appends from a stale index costs vs retraining — is
    this row set next to ann_recall_residual's (the retrained index on
    the same corpus): two independently driver-hash-checked recalls,
    the same pattern as the residual-vs-raw lift."""
    return ",\n".join(
        _ivfpq_residual_ctes(
            n_queries=n_queries, train_filter=_ANN_BASE_FILTER
        )
    ) + _recall_tail(k, n_queries)


#: Append-audit corpus split: vectors with vec_id % 10 in {8, 9} arrive
#: AFTER the index is trained (so the PQ seeds, ids 0–7, are all in the
#: base slice and the probe queries span both slices).
_ANN_BASE_FILTER = "vec_id % 10 < 8"


def _trained_cells_parts(iters: int = 2, n_cells: int = 8) -> list[str]:
    """The d → coarse-train → celld → cells chain prefix shared by every
    oracle that consumes trained cells without PQ (SemDeDup, the
    cell-balanced sampler)."""
    parts = [
        "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, e AS cv FROM d WHERE vec_id < {n_cells})",
    ]
    parts += _lloyd_coarse_parts(iters)
    parts += [
        f"""celld AS (
  SELECT d.vec_id, c.cid, {_SQ.format(a="d.e", b="c.cv")} AS dist
  FROM d CROSS JOIN c{iters} c
)""",
        """cells AS (
  SELECT vec_id, (min(struct_pack(d := dist, c := cid))).c AS cell
  FROM celld GROUP BY vec_id
)""",
    ]
    return parts


def _cell_balanced_sample_oracle(
    iters: int = 2, n_cells: int = 8, quota: int = 32
) -> str:
    """sample_cell_balanced's oracle: trained cells + a per-cell
    deterministic-hash top-``quota`` cut (md5 of the stable id, the
    dataset_shuffle_order key, tie-broken by the id — a total,
    bit-reproducible order both engines agree on)."""
    parts = _trained_cells_parts(iters, n_cells) + [
        """picked AS (
  SELECT vec_id, cell,
         md5(CAST(vec_id AS VARCHAR)) AS sample_key,
         row_number() OVER (PARTITION BY cell
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           AS cell_rank
  FROM cells
)""",
    ]
    return ",\n".join(_materialize(parts)) + f"""
SELECT vec_id, cell, CAST(cell_rank AS BIGINT) AS cell_rank, sample_key
FROM picked WHERE cell_rank <= {quota}
"""


def _semantic_dedup_oracle(
    iters: int = 2, n_cells: int = 8, threshold: float = 0.25
) -> str:
    """dedup_semantic_cells' oracle: the shared coarse-training chain
    (cells = the SemDeDup clusters), then the UNCOLLAPSED greedy rule —
    a vector is dropped iff a lower-id same-cell vector clears the
    cosine threshold. The Spark operator's identical-vector collapse is
    a pure optimization the oracle need not replay (cos(v, v-copy)
    clears any threshold ≤ 1, so collapse preserves the rule)."""
    parts = _trained_cells_parts(iters, n_cells)
    parts += [
        """n AS (
  SELECT d.vec_id, d.e, ce.cell FROM d JOIN cells ce ON d.vec_id = ce.vec_id
)""",
        f"""dropped AS (
  SELECT DISTINCT a.vec_id
  FROM n a JOIN n b ON a.cell = b.cell AND b.vec_id < a.vec_id
  WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
)""",
    ]
    return ",\n".join(_materialize(parts)) + """
SELECT n.vec_id, n.cell, dr.vec_id IS NULL AS kept
FROM n LEFT JOIN dropped dr ON n.vec_id = dr.vec_id
"""


#: k-means‖ per-round hash constants — ONE source with the Spark
#: operator (operators/similarity.py _KMPAR_A/_KMPAR_B): multipliers
#: exceed P so sequential ids wrap the modulus (the MinHash multipliers
#: would concentrate u(x) near 0 and select everything).
_KMPAR_A = (1103515245, 2027730535)
_KMPAR_B = (12345, 54321)

#: Registered k-means‖ config (rounds, oversample ℓ, reduce iterations).
_KMPAR_ROUNDS = 2
_KMPAR_ELL = 16
_KMPAR_T = 2


def _kmeanspar_seed_parts(
    n_cents: int = 8,
    rounds: int = _KMPAR_ROUNDS,
    ell: int = _KMPAR_ELL,
    t_reduce: int = _KMPAR_T,
    out: str = "pc0",
) -> list[str]:
    """CTE chain replaying k-means‖ seeding (Bahmani et al., VLDB 2012;
    VERDICT r12 item 3) in DuckDB, bitwise against
    ``operators/similarity.kmeanspar_seeds``: min-id start, ``rounds``
    oversampling passes gated by the deterministic hash-uniform
    ``((id·aᵣ+bᵣ) mod P)/P < ℓ·du/φ`` (1e-9 integer-unit costs, exact
    integer φ cast to DOUBLE — the same value Spark collects and
    re-injects as a literal), nearest-candidate region weights, then
    ``t_reduce`` weighted-Lloyd reduce iterations from the
    top-``n_cents``-by-weight candidates (DECIMAL(38,0)-exact weighted
    1e-12-unit means ≡ the operator's unbounded Python ints; an emptied
    seed keeps its position). The final relation ``out`` (cid, cv) is a
    drop-in ``c0`` for :func:`_lloyd_coarse_parts`."""
    from ..functions.hashing import P

    parts = [
        "kps0 AS (SELECT vec_id AS cid, e AS cv FROM d "
        "WHERE vec_id = (SELECT min(vec_id) FROM d))",
    ]
    for r in range(1, rounds + 1):
        a, b = _KMPAR_A[r - 1], _KMPAR_B[r - 1]
        parts += [
            f"""kpdist{r} AS (
  SELECT d.vec_id,
         CAST(floor(min({_SQ.format(a="d.e", b="s.cv")}) * 1e9
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS du
  FROM d CROSS JOIN kps{r - 1} s GROUP BY d.vec_id
)""",
            f"""kpsel{r} AS (
  SELECT vec_id FROM kpdist{r}
  WHERE CAST((vec_id * {a} + {b}) % {P} AS DOUBLE) / CAST({P} AS DOUBLE)
      < ({ell} * CAST(du AS DOUBLE))
        / (SELECT CAST(sum(du) AS DOUBLE) FROM kpdist{r})
)""",
            f"""kps{r} AS (
  SELECT * FROM kps{r - 1}
  UNION ALL
  SELECT d.vec_id AS cid, d.e AS cv FROM d JOIN kpsel{r} USING (vec_id)
)""",
        ]
    parts += [
        f"""kpnear AS (
  SELECT d.vec_id,
         (min(struct_pack(d := {_SQ.format(a="d.e", b="s.cv")},
                          c := s.cid))).c AS ncid
  FROM d CROSS JOIN kps{rounds} s GROUP BY d.vec_id
)""",
        # INNER join: a candidate with an empty region (a duplicate
        # vector losing the d=0 tie to a smaller id) has no mass — it
        # neither seeds nor votes in the reduce (the operator's
        # weights.get(cid) filter).
        f"""kpw AS (
  SELECT s.cid, s.cv, count(w.vec_id) AS w
  FROM kps{rounds} s JOIN kpnear w ON w.ncid = s.cid
  GROUP BY s.cid, s.cv
)""",
        f"""kpr0 AS (
  SELECT cid, cv FROM (
    SELECT cid, cv, row_number() OVER (ORDER BY w DESC, cid ASC) AS rn
    FROM kpw
  ) WHERE rn <= {n_cents}
)""",
    ]
    wmean = (
        "CAST(SUM(CAST(t.w AS DECIMAL(38,0))"
        " * CAST(floor(u.v * 1e12 + CAST(0.5 AS DOUBLE))"
        " AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / SUM(t.w)"
    )
    for t in range(1, t_reduce + 1):
        parts += [
            f"""kpa{t} AS (
  SELECT c.cid, c.cv, c.w,
         (min(struct_pack(d := {_SQ.format(a="c.cv", b="r.cv")},
                          c := r.cid))).c AS scid
  FROM kpw c CROSS JOIN kpr{t - 1} r GROUP BY c.cid, c.cv, c.w
)""",
            f"""kpu{t} AS (
  SELECT t.scid, u.i AS dim, {wmean} AS nc
  FROM (SELECT scid, w,
               unnest(list_transform(cv, (x, i) -> {{'i': i, 'v': x}})) AS u
        FROM kpa{t}) t
  GROUP BY t.scid, u.i
)""",
            f"kpn{t} AS (SELECT scid AS cid, list(nc ORDER BY dim) AS cv "
            f"FROM kpu{t} GROUP BY scid)",
            f"kpr{t} AS (SELECT r.cid, coalesce(n.cv, r.cv) AS cv "
            f"FROM kpr{t - 1} r LEFT JOIN kpn{t} n USING (cid))",
        ]
    parts.append(f"{out} AS (SELECT cid, cv FROM kpr{t_reduce})")
    return parts


_DIST_UNITS = """{name} AS (
  SELECT CAST(sum(du) AS BIGINT) AS distortion_units FROM (
    SELECT CAST(floor(min({sq}) * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS du
    FROM d CROSS JOIN {rel} c GROUP BY d.vec_id
  )
)"""


def _lloyd_kmeanspar_oracle(n_cents: int = 8, iters: int = 2) -> str:
    """lloyd_train_kmeanspar's oracle: the k-means‖ seed chain, then
    ``iters`` coarse Lloyd iterations from those seeds (the prefixed
    twin of the first-k chain), exploded to (cell, pos, component)."""
    parts = [
        "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
    ]
    parts += _kmeanspar_seed_parts(n_cents, out="pc0")
    parts += _lloyd_coarse_parts(iters, pfx="p")
    return ",\n".join(_materialize(parts)) + f"""
SELECT cid AS cell, CAST(u.i - 1 AS BIGINT) AS pos, u.v AS component
FROM (SELECT cid,
             unnest(list_transform(cv, (x, i) -> {{'i': i, 'v': x}})) AS u
      FROM pc{iters})
"""


def _kmeanspar_distortion_oracle(n_cents: int = 8, iters: int = 2) -> str:
    """kmeanspar_distortion_audit's oracle: four quantization
    distortions as one driver-hashed row set — first-k vs k-means‖
    seeds, each at 0 and ``iters`` Lloyd iterations. The seed-level
    rows carry the k-means‖ lift; the trained rows document the shared
    plateau (structure-free corpus: any reasonable init converges)."""
    parts = [
        "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, e AS cv FROM d WHERE vec_id < {n_cents})",
    ]
    parts += _lloyd_coarse_parts(iters)
    parts += _kmeanspar_seed_parts(n_cents, out="pc0")
    parts += _lloyd_coarse_parts(iters, pfx="p")
    sq = _SQ.format(a="d.e", b="c.cv")
    for name, rel in (
        ("fk0", "c0"),
        (f"fk{iters}", f"c{iters}"),
        ("kp0", "pc0"),
        (f"kp{iters}", f"pc{iters}"),
    ):
        parts.append(_DIST_UNITS.format(name=f"dist_{name}", sq=sq, rel=rel))
    rows = "\nUNION ALL\n".join(
        f"SELECT 'first_k' AS init, CAST(0 AS BIGINT) AS iters, "
        f"distortion_units FROM dist_fk0"
        if i == 0
        else f"SELECT '{init}', CAST({it} AS BIGINT), distortion_units "
        f"FROM dist_{name}"
        for i, (init, it, name) in enumerate(
            (
                ("first_k", 0, "fk0"),
                ("first_k", iters, f"fk{iters}"),
                ("kmeans_par", 0, "kp0"),
                ("kmeans_par", iters, f"kp{iters}"),
            )
        )
    )
    return ",\n".join(_materialize(parts)) + "\n" + rows

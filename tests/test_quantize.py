"""Int8 quantization audit: the reported reconstruction error must obey
the scalar-quantization guarantee — floor(x+0.5) rounding puts every
reconstructed component within HALF a quantization step of the original,
per dimension: |x - recon| <= (mx_d - mn_d) / 255 / 2."""

from __future__ import annotations

import duckdb

from ohlc_spark_streaming_spark.registry import QUERIES

from .conftest import SF_SMOKE


def test_quantization_error_within_half_step(spark):
    rows = QUERIES["embedding_quantize_int8"](spark, SF_SMOKE).collect()
    assert rows, "audit must produce one row per vector"
    # Per-dim ranges recomputed independently (DuckDB).
    ranges = duckdb.sql(
        f"""
        SELECT max(u.v) - min(u.v) AS r
        FROM (
          SELECT unnest(list_transform(embedding::DOUBLE[],
                                       (x, i) -> {{'i': i, 'v': x}})) AS u
          FROM '{SF_SMOKE}/embeddings.parquet'
        ) GROUP BY u.i
        """
    ).fetchall()
    half_step = max(r[0] for r in ranges) / 255.0 / 2.0
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchone()[0]
    assert len(rows) == n_vecs
    for r in rows:
        assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"]
        assert r["max_abs_err"] <= half_step + 1e-12, (
            r["vec_id"],
            r["max_abs_err"],
            half_step,
        )

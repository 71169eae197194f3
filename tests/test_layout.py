"""Z-order layout: files must cover compact rectangles of the key space,
which is what makes multi-column min/max pruning effective."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from ohlc_spark_streaming_spark.operators.layout import write_zordered
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def _file_bbox_areas(path: str, col_a: str, col_b: str) -> list[float]:
    """Per-parquet-file bounding-box area in (col_a, col_b) space."""
    areas = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo_a = hi_a = lo_b = hi_b = None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == col_a:
                    lo_a = st.min if lo_a is None else min(lo_a, st.min)
                    hi_a = st.max if hi_a is None else max(hi_a, st.max)
                elif name == col_b:
                    lo_b = st.min if lo_b is None else min(lo_b, st.min)
                    hi_b = st.max if hi_b is None else max(hi_b, st.max)
        if lo_a is not None and lo_b is not None:
            areas.append((hi_a - lo_a + 1) * (hi_b - lo_b + 1))
    return areas


def test_zorder_write_localizes_files(tmp_path, spark):
    l = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_suppkey")
    n_rows = l.count()
    per_file = max(200, n_rows // 12)

    plain_path = str(tmp_path / "plain")
    (
        l.repartition(4)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", per_file)
        .parquet(plain_path)
    )
    z_path = str(tmp_path / "zorder")
    write_zordered(l, z_path, "l_partkey", "l_suppkey", max_records_per_file=per_file)

    # Same data either way.
    assert spark.read.parquet(z_path).count() == n_rows

    plain = _file_bbox_areas(plain_path, "l_partkey", "l_suppkey")
    z = _file_bbox_areas(z_path, "l_partkey", "l_suppkey")
    assert len(z) >= 4  # enough files for pruning to mean anything
    # Z-ordered files must cover dramatically smaller rectangles: a random
    # (unsorted) write gives every file ~the full key-space bbox.
    assert sum(z) / len(z) < 0.5 * (sum(plain) / len(plain)), (
        sorted(z),
        sorted(plain),
    )


def test_compose_yaml_parses():
    """docker/compose.yml must stay valid YAML with the expected top-level
    structure even on hosts without the compose plugin (the README's
    live-Kafka path depends on it booting unchanged elsewhere)."""
    import os
    import re

    import pytest

    yaml = pytest.importorskip("yaml")
    path = os.path.join(os.path.dirname(__file__), "..", "docker", "compose.yml")
    with open(path) as f:
        txt = f.read()
    doc = yaml.safe_load(re.sub(r"\$\{[A-Z_]+\}", "x", txt))
    assert set(doc) == {"services", "volumes", "networks"}
    svc = doc["services"]["spark-submit"]
    assert svc["restart"] == "unless-stopped"
    assert any("KAFKA_BOOTSTRAP_SERVERS" in e for e in svc["environment"])

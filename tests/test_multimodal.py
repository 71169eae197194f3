"""Multimodal column plumbing: mapInPandas schema/batching and the decoder
registry (SURVEY.md §2.11 — decode is stubbed; the Spark-side contract is
what is under test)."""

from __future__ import annotations

import pytest

from ohlc_spark_streaming_spark.operators import multimodal
from ohlc_spark_streaming_spark.sources.batch import load_table

from .conftest import SF_SMOKE


def _assets(spark):
    return multimodal.attach_payloads(load_table(spark, SF_SMOKE, "documents"))


def test_custom_decoder_registration(spark):
    """A registered decoder replaces the stub for its modality."""
    multimodal.DECODERS["text"] = lambda payload: f"custom:{len(payload)}"
    try:
        row = (
            multimodal.extract_features(_assets(spark))
            .where("asset_id = 0")
            .collect()[0]
        )
        assert row.feature == f"custom:{row.n_bytes}"
    finally:
        del multimodal.DECODERS["text"]


def test_decode_unavailable_raises(spark):
    """The explicit unavailable-decoder stub surfaces NotImplementedError
    (no media libraries in this environment)."""
    multimodal.DECODERS["text"] = multimodal.decode_unavailable
    try:
        with pytest.raises(Exception, match="NotImplementedError|media decoding"):
            multimodal.extract_features(_assets(spark)).collect()
    finally:
        del multimodal.DECODERS["text"]


def test_payloads_roundtrip_bytes(spark):
    """payload is the exact utf-8 encoding; metadata map carries modality."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(5).collect()
    assets = {r.asset_id: r for r in _assets(spark).limit(5).collect()}
    for d in docs:
        if d.doc_id in assets:
            a = assets[d.doc_id]
            assert bytes(a.payload) == d.text.encode("utf-8")
            assert a.meta["modality"] == "text"


def test_resize_requires_registered_decoder(spark):
    """The resize path surfaces NotImplementedError without an imaging
    library; a registered resizer flows through the same plumbing."""
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        multimodal.resize_assets(_assets(spark), 64, 64).collect()
    multimodal.DECODERS["image/resize"] = lambda p: p[:16]
    try:
        out = multimodal.resize_assets(_assets(spark), 64, 64)
        rows = out.limit(3).collect()
        assert all(len(bytes(r.payload)) <= 16 for r in rows)
        assert all(r.meta["resized_to"] == "64x64" for r in rows)
    finally:
        del multimodal.DECODERS["image/resize"]

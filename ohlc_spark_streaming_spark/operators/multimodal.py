"""Multimodal column operators (SURVEY.md §2.11).

Convention: an asset is an opaque ``binary`` payload plus typed metadata
(``map<string,string>``); Parquet column pruning means the blob bytes are
never read unless the payload column is selected — which is the entire
point of the layout at 100 TB (metadata-only scans stay cheap).

The decode/feature-extract steps run as Arrow-batched ``mapInPandas``
UDFs — the Spark-side plumbing (schema, batch iteration, partition
independence) is real and tested; the actual media decoding is stubbed
behind ``DECODERS`` because no image/audio libraries exist in this
container. A real deployment registers decoders; everything else is
unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes long, payload_hash string, "
    "feature string"
)

#: modality → decoder(payload bytes) -> feature string. Real deployments
#: register e.g. image size extraction here; the default fake decoder is
#: deterministic so pipelines are testable end-to-end.
DECODERS: dict[str, Callable[[bytes], str]] = {}


def _fake_decode(payload: bytes) -> str:
    """Deterministic stand-in for a media decoder (no media libs here)."""
    return f"len={len(payload)};head={payload[:4].hex()}"


def decode_unavailable(payload: bytes) -> str:
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; register a decoder in multimodal.DECODERS"
    )


def attach_payloads(df: DataFrame, text_col: str = "text", modality: str = "text") -> DataFrame:
    """Derive a multimodal asset table from a text table: payload = utf-8
    bytes, metadata map with modality + source columns. Used to exercise
    the binary-column plumbing against real data."""
    return df.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.create_map(
            F.lit("modality"), F.lit(modality),
            F.lit("source"), F.col("source"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the blobs executor-local (no shuffle): each
    partition's batches stream through the Python worker once.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for batch in batches:
            payloads = batch["payload"]
            modalities = batch["modality"]
            features = []
            for payload, modality in zip(payloads, modalities):
                decoder = DECODERS.get(modality, _fake_decode)
                features.append(decoder(bytes(payload)))
            yield pd.DataFrame(
                {
                    "asset_id": batch["asset_id"],
                    "modality": modalities,
                    "n_bytes": payloads.map(len),
                    "payload_hash": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": features,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def blob_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only scan: per-modality/source byte accounting. Stays
    JVM-side; the payload column is touched only for length/digest."""
    return (
        assets.groupBy("modality", F.col("meta").getItem("source").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.countDistinct(F.sha2("payload", 256)).alias("n_distinct_payloads"),
        )
    )


FRAME_SCHEMA = "asset_id long, frame_id long, frame_len long, frame_head string"


def sample_frames(
    assets: DataFrame, frame_size: int = 32, every: int = 4
) -> DataFrame:
    """Frame sampling over binary payloads: treat the payload as a
    sequence of fixed-size frames and keep every ``every``-th one.

    The byte-slicing plumbing is REAL (no media library needed) — a video
    pipeline swaps the fixed-size slicer for a container demuxer and
    keeps the same Arrow-batched shape. One pass, executor-local, output
    rows ~ payload_bytes / (frame_size * every).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, fids, lens, heads = [], [], [], []
            for asset_id, payload in zip(batch["asset_id"], batch["payload"]):
                data = bytes(payload)
                n_frames = max((len(data) + frame_size - 1) // frame_size, 1)
                for i in range(0, n_frames, every):
                    frame = data[i * frame_size : (i + 1) * frame_size]
                    ids.append(asset_id)
                    fids.append(i)
                    lens.append(len(frame))
                    heads.append(frame[:4].hex())
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_id": fids,
                    "frame_len": lens,
                    "frame_head": heads,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def resize_assets(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: decode → resize → re-encode per payload via
    the DECODERS registry ('image/resize' key). No imaging library exists
    in this container, so the default path raises NotImplementedError —
    the Spark-side contract (schema, batching, metadata update) is what
    is real and tested."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize = DECODERS.get("image/resize", decode_unavailable)
        for batch in batches:
            out = batch.copy()
            out["payload"] = [
                resize(bytes(p)) for p in batch["payload"]
            ]
            yield out

    return assets.select("asset_id", "payload").mapInPandas(
        run, "asset_id long, payload binary"
    ).withColumn("meta", F.create_map(
        F.lit("resized_to"), F.lit(f"{width}x{height}")
    ))

"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

Beyond-reference operators for the training-data pipeline (driver mandate).
The Spark-side contract is real and tested — schema conventions, partition
behaviour, Arrow batch shapes through ``mapInPandas`` — while the actual
codec work (JPEG decode, resampling, frame extraction) is stubbed: the
container ships no image/audio libraries, so decoders raise
``NotImplementedError`` unless a deterministic fake is requested.

Schema convention for a multimodal asset table:
    asset_id BIGINT, modality STRING, content BINARY, meta STRUCT<...>
Feature outputs are fixed-width double arrays so downstream similarity
operators (operators.similarity) consume them unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

ASSET_SCHEMA = (
    "asset_id BIGINT, modality STRING, content BINARY, "
    "meta STRUCT<source: STRING, width: INT, height: INT, sample_rate: INT>"
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque binary assets — lets the
    whole multimodal path run (and be benchmarked) on the driver testdata."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def content_stats(assets: DataFrame) -> DataFrame:
    """Cheap JVM-side byte stats: size + content hash (dedup key)."""
    return assets.select(
        "asset_id",
        "modality",
        F.octet_length("content").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.crc32("content").alias("content_crc32"),
    )


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: md5-seeded unit vector.

    Stable across runs/executors — the plumbing (batching, schema,
    partitioning) is exercised for real; swap in a real model by replacing
    this function only.
    """
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "big")
    rng = np.random.RandomState(seed % (2**32))
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Image decode stub: the container has no image codec libraries.

    Replace with e.g. PIL/turbojpeg in a real deployment; the Spark-side
    call sites (extract_features) do not change.
    """
    raise NotImplementedError("image decoding requires an image codec library")


def decode_audio(content: bytes):  # pragma: no cover - stub by design
    """Audio decode stub (see decode_image)."""
    raise NotImplementedError("audio decoding requires an audio codec library")


def extract_features(
    assets: DataFrame,
    dim: int = FEATURE_DIM,
    use_fake_encoder: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction: (asset_id, feature array<double>).

    ``mapInPandas`` keeps whole-file bytes off the driver and vectorises per
    batch; output schema is plan-time fixed. With ``use_fake_encoder=False``
    the real decoders are called (and raise until codecs are installed).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, modality in zip(pdf["content"], pdf["modality"]):
                raw = bytes(content)
                if use_fake_encoder or modality == "text":
                    feats.append(_fake_feature(raw, dim))
                elif modality == "image":
                    feats.append(decode_image(raw))
                elif modality == "audio":
                    feats.append(decode_audio(raw))
                else:
                    raise NotImplementedError(f"modality {modality!r}")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return assets.select("asset_id", "modality", "content").mapInPandas(
        run, schema="asset_id BIGINT, feature ARRAY<DOUBLE>"
    )


def frame_sample_plan(
    assets: DataFrame, frames_per_asset: int = 4
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per (asset, frame_idx).

    The explode happens before decode, so per-frame work partitions across
    executors; the decode itself is the stubbed step.
    """
    idx = F.explode(F.sequence(F.lit(0), F.lit(frames_per_asset - 1)))
    return assets.withColumn("frame_idx", idx).select(
        "asset_id", "modality", "frame_idx", "content", "meta"
    )


def resize_images(
    assets: DataFrame,
    width: int = 64,
    height: int = 64,
    use_fake: bool = True,
) -> DataFrame:
    """Image-resize plumbing: (asset_id, width, height, thumbnail binary).

    Arrow-batched over ``mapInPandas``; the resample kernel is the stubbed
    codec step (``decode_image`` until an image library is installed). The
    deterministic fake emits a width*height byte thumbnail by striding the
    source bytes, so batch shapes, output schema, and sizes are real and
    testable; Spark-side partitioning is inherited from the asset scan
    (one task per input split, no shuffle).
    """
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for raw in pdf["content"]:
                raw = bytes(raw)
                if not use_fake:
                    thumbs.append(decode_image(raw))
                    continue
                if not raw:
                    thumbs.append(b"\x00" * n_out)
                    continue
                # stride-subsample the payload to exactly n_out bytes
                idx = (np.arange(n_out) * len(raw) // n_out) % len(raw)
                thumbs.append(np.frombuffer(raw, dtype=np.uint8)[idx].tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "thumbnail": thumbs,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        run, schema="asset_id BIGINT, width INT, height INT, thumbnail BINARY"
    )

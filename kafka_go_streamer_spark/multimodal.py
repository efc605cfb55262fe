"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over ``mapInPandas``.

The decode step itself is STUBBED — the image/audio libraries are not
in this container — behind ``decode_image_stub``, a deterministic fake
that derives plausible metadata from the bytes. Everything around it is
real and tested: the binary schema, the Arrow batch shape, the
mapInPandas signature, and the partitioning story (decode is a narrow
per-batch transform; no shuffle, scales linearly with input splits).

Swap ``decode_image_stub`` for a real decoder (PIL / torchvision /
ffmpeg) without touching the Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage: the typed metadata a real decoder
#: would produce for an image payload.
DECODE_SCHEMA = (
    "key bigint, byte_len int, format string, width int, height int, "
    "channels int, content_hash string"
)


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. A real implementation would call
    PIL.Image.open / libvips here; the container has neither, so derive
    stable fake dimensions from the payload bytes. Raises on empty
    payloads like a real decoder would."""
    if not payload:
        raise ValueError("empty payload")
    digest = hashlib.sha256(payload).digest()
    return {
        "byte_len": len(payload),
        "format": ("png", "jpeg", "webp")[digest[0] % 3],
        "width": 64 + digest[1] * 8,
        "height": 64 + digest[2] * 8,
        "channels": 3,
        "content_hash": hashlib.sha256(payload).hexdigest(),
    }


def decode_images(df: DataFrame, key_col: str, blob_col: str) -> DataFrame:
    """Decode a binary column into typed metadata via mapInPandas.

    Arrow moves each partition to Python in columnar batches; the
    decode loop is per-batch, not per-row-serialized. Narrow transform:
    partitioning and ordering of the input are preserved, no shuffle."""
    from kafka_go_streamer_spark.sources.tables import fan_out

    src = fan_out(
        df.select(F.col(key_col).alias("key"), F.col(blob_col).alias("blob"))
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_image_stub(bytes(b)) for b in pdf["blob"]]
            out = pd.DataFrame(metas)
            out.insert(0, "key", pdf["key"].values)
            yield out

    return src.mapInPandas(batches, DECODE_SCHEMA)


def synthetic_blobs(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """Build a (key, blob) frame from a text column — the stand-in for a
    real image/audio payload table in this container."""
    return df.select(
        F.col(key_col).alias("key"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )


#: Frame-sampling parameters for the (stubbed) video path: fixed frame
#: size in bytes and the keep-every-Nth stride. A real pipeline gets
#: these from the container header; frozen here so the SQL oracle can
#: replay the slicing exactly.
FRAME_BYTES = 16
FRAME_STRIDE = 4

FRAME_SCHEMA = "key bigint, frame_idx int, frame_sha string"


def sample_frames(df: DataFrame, key_col: str, blob_col: str) -> DataFrame:
    """Sample every ``FRAME_STRIDE``-th fixed-size frame from a binary
    payload (the video analogue of ``decode_images``): one input row
    fans out to ``ceil(n_frames / stride)`` output rows carrying the
    frame index and a content hash.

    A real implementation would run ffmpeg keyframe extraction inside
    the same ``mapInPandas`` generator; the slicing stub keeps the
    plumbing — Arrow batch transfer, 1→N row fan-out, narrow no-shuffle
    plan — identical to production.
    """
    from kafka_go_streamer_spark.sources.tables import fan_out

    src = fan_out(
        df.select(F.col(key_col).alias("key"), F.col(blob_col).alias("blob"))
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keys, idxs, shas = [], [], []
            for key, blob in zip(pdf["key"], pdf["blob"]):
                payload = bytes(blob)
                n_frames = len(payload) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = payload[
                        i * FRAME_BYTES : (i + 1) * FRAME_BYTES
                    ]
                    keys.append(key)
                    idxs.append(i)
                    shas.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {"key": keys, "frame_idx": idxs, "frame_sha": shas}
            )

    return src.mapInPandas(batches, FRAME_SCHEMA)

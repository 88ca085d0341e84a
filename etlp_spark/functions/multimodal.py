"""Multimodal column plumbing: images/audio/video as opaque binary.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes clearly marked below); everything
Spark-side is real and tested — schema contracts, Arrow batch shape,
``mapInPandas`` partitioning behavior, metadata propagation.

Scale design: binary payloads ride in parquet as ``binary`` columns
with typed metadata structs alongside. Feature extraction is
embarrassingly parallel → ``mapInPandas`` with Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory
per batch: payload_bytes × batch_rows must fit the executor). No
shuffle is introduced: the UDF runs in the scan stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "attach_fake_media",
    "extract_features",
    "resize_media",
    "sample_frames",
    "decode_image",
]

#: contract for a multimodal row: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB — image decoding requires codec libraries not present in
    this container. The Spark plumbing around it is real; swap this
    for PIL/torchvision in a full environment."""
    raise NotImplementedError(
        "image decode is stubbed in this environment; install a codec "
        "library and replace decode_image"
    )


def _fake_feature(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic fake 'embedding' of a binary payload (md5-seeded)
    standing in for the stubbed decode→featurize kernel."""
    h = hashlib.md5(payload).digest()
    return [(h[i % 16] / 255.0) * 2 - 1 for i in range(dims)]


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Manufacture a deterministic binary payload column from text —
    exercises BinaryType end-to-end without real media files."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).cast("int").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
    )


def extract_features(media_df: DataFrame, dims: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas chunk holds whole payloads — the real
    pattern for image embedding/resampling jobs. The kernel here is
    the deterministic fake; the batch shape, schema contract, and
    partition behavior are the real thing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
                    "feature": pdf["payload"].map(lambda b: _fake_feature(b, dims)),
                }
            )
            yield out

    return media_df.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_media(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: same MEDIA_SCHEMA in and out, target dims in
    the metadata, payload rewritten by the kernel. The pixel resample
    itself needs the stubbed codec (``decode_image``), so the fake
    kernel marks resized payloads deterministically (md5 of the
    original + target dims) — schema contract, Arrow batch shape and
    scan-stage (no shuffle) behavior are the real thing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                lambda b: hashlib.md5(b + f"@{width}x{height}".encode()).digest()
            )
            out["width"] = width
            out["height"] = height
            yield out

    return media_df.mapInPandas(kernel, MEDIA_SCHEMA)


#: contract for a sampled frame: media fan-out is one row per frame.
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: one media row fans out to ``n_frames``
    frame rows — the one-to-many Arrow-batch shape every video
    pipeline needs (decode → pick every Nth frame). Real decoders are
    stubbed (no codecs in this container); the fake kernel derives
    each frame deterministically from the payload + index. The
    fan-out happens inside the scan stage: no shuffle, output rows =
    |media| × n_frames, and Arrow batch memory is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.md5(payload + bytes([i])).digest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media_df.mapInPandas(kernel, FRAME_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Design for 100 TB of images/audio/video on Spark:

- the asset is an opaque ``binary`` column next to a typed metadata
  struct (format/width/height/n_frames) — never a Python object;
- decode / feature-extract / frame-sample run as ``mapInPandas``
  generators: Arrow moves the bytes JVM→Python once per batch, the
  UDF is vectorized over the batch, and output is again columnar;
- batch size is bounded by ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` so executor memory holds (batch × asset)
  comfortably — the knob that matters when assets are MBs, not KBs.

The actual image/audio codecs are NOT available in this
environment, so `decode_image` is an explicit stub
(NotImplementedError) and the tested path uses a deterministic
byte-level featurizer — the Spark-side schema, partitioning, UDF
signature, and batch shape are the real thing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("content", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthetic_assets(docs: DataFrame) -> DataFrame:
    """Deterministic fake assets from the documents table: content =
    UTF-8 bytes of the text (standing in for encoded image bytes),
    metadata derived from doc fields. The *plumbing* (binary column
    + typed metadata) is exactly what a real ingest produces."""
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("webm")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("content"),
        fmt.alias("format"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 2, (F.col("doc_id") % 25 + 2).cast("int"))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("n_frames"),
    )


def decode_image(content: bytes) -> "np.ndarray":
    """Real codec entry point — not available in this environment.

    A production deployment plugs Pillow/libvips here; everything
    around it (Arrow batching, schema, partitioning) is unchanged.
    """
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use extract_features (deterministic byte featurizer) instead"
    )


def _byte_features(content: bytes) -> np.ndarray:
    """Deterministic stand-in featurizer: 16-bin byte histogram,
    L1-normalized — stable across runs/engines."""
    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return (hist / arr.size).astype(np.float32)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_byte_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": pdf["format"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video-like assets: split the payload into
    ``n_frames`` chunks, keep every k-th — the real thing would call
    a demuxer per batch; the chunking/batching/explosion shape is
    identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, content, n_frames in zip(
                pdf["asset_id"], pdf["content"], pdf["n_frames"]
            ):
                n = max(int(n_frames), 1)
                step = max(len(content) // n, 1)
                for i in range(0, n, every_k):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(content[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_assets(assets: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize pass over image-like assets. The pixel resample itself
    belongs to the stubbed codec layer (`decode_image`); what IS
    real — and what matters on a cluster — is the pass's shape:
    Arrow-batched mapInPandas, binary in → binary out, metadata
    struct updated, payload size scaled to the target pixel count
    so downstream stages see realistic post-resize batch sizes.

    The deterministic stand-in "resample" byte-subsamples the
    payload to round(len * (target_px / source_px)) bytes with a
    fixed stride — stable across runs, partitionings, and engines.
    """
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("content", BinaryType()),
            StructField("format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_frames", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                scale = (target_w * target_h) / max(int(w) * int(h), 1)
                n_out = max(int(round(len(content) * min(scale, 1.0))), 1)
                idx = np.linspace(0, max(len(content) - 1, 0), n_out).astype(np.int64)
                arr = np.frombuffer(content, dtype=np.uint8)
                out.append(arr[idx].tobytes() if arr.size else b"\x00")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "content": out,
                    "format": pdf["format"],
                    "width": np.full(len(pdf), target_w, dtype=np.int32),
                    "height": np.full(len(pdf), target_h, dtype=np.int32),
                    "n_frames": pdf["n_frames"],
                }
            )

    return assets.mapInPandas(run, schema=schema)

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

Codecs: a real, pure-numpy BMP codec (24-bit uncompressed BI_RGB —
a fully public format) is bundled, so `decode_image` genuinely
decodes pixels for BMP payloads; compressed formats (png/jpeg/webm)
still raise NotImplementedError because their codec libraries are
not installed here — a production deployment plugs Pillow/libvips
into the same entry point. The byte-level featurizer remains the
format-agnostic path.
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
    DoubleType,
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


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed
    BMP (BITMAPINFOHEADER, BI_RGB): bottom-up row order, BGR byte
    order, rows padded to 4-byte boundaries — the standard layout
    every BMP reader expects."""
    import struct

    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # RGB → BGR, bottom-up, per-row padding
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + info + rows.tobytes()


def decode_image(content: bytes) -> "np.ndarray":
    """Decode an image payload to an (h, w, 3) uint8 RGB array.

    Real decode for 24-bit uncompressed BMP (pure numpy — public
    format, no external codec needed). Compressed formats raise
    NotImplementedError: their codecs (Pillow/libvips) are not
    installed in this environment; a production deployment plugs
    them into this same entry point and everything around it (Arrow
    batching, schema, partitioning) is unchanged.
    """
    import struct

    if len(content) >= 2 and content[:2] == b"BM":
        off = struct.unpack_from("<I", content, 10)[0]
        size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", content, 14)
        if size < 40 or planes != 1 or bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"only 24-bit uncompressed BI_RGB BMP is supported "
                f"(got bpp={bpp}, compression={comp})"
            )
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        data = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=off)
        rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR → RGB
    raise NotImplementedError(
        "compressed image codecs (png/jpeg/webm) are not installed in "
        "this environment; BMP decodes natively, or use "
        "extract_features (deterministic byte featurizer)"
    )


def _formula_pixels(asset_id: int) -> "np.ndarray":
    """Deterministic (h, w, 3) uint8 image for an asset id — integer
    formulas only, so a SQL oracle can restate the expected pixels
    without parsing BMP bytes. Widths 2-6 exercise every 4-byte
    row-padding case."""
    aid = int(asset_id)
    w = aid % 5 + 2
    h = aid % 4 + 2
    y, x = np.mgrid[0:h, 0:w]
    r = (aid + 7 * y + 13 * x) % 256
    g = (3 * aid + 5 * y + x) % 256
    b = (11 * y + 17 * x + aid // 3) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


BMP_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synthetic_bmp_assets(docs: DataFrame) -> DataFrame:
    """REAL encoded-image assets: each doc id becomes a valid 24-bit
    BMP payload of formulaic pixels, built inside an Arrow-batched
    ``mapInPandas`` (binary out) — the ingest half of a genuine
    decode round-trip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [_formula_pixels(a) for a in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "content": [encode_bmp(p) for p in px],
                    "width": [p.shape[1] for p in px],
                    "height": [p.shape[0] for p in px],
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=BMP_ASSET_SCHEMA)


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("top_left_r", LongType()),
        StructField("bottom_right_b", LongType()),
    ]
)


def decode_stats(assets: DataFrame) -> DataFrame:
    """Decode each binary payload with the REAL codec
    (`decode_image`) and emit exact integer pixel statistics. The
    corner probes are position-sensitive: a decoder that mishandled
    BMP's bottom-up row order or row padding produces different
    values, so an oracle hash-match verifies true pixel-level
    decoding, not just byte plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                px = decode_image(content).astype(np.int64)
                rows.append(
                    (
                        aid,
                        px.shape[1],
                        px.shape[0],
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int(px[0, 0, 0]),
                        int(px[-1, -1, 2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "sum_r", "sum_g",
                    "sum_b", "top_left_r", "bottom_right_b",
                ],
            )

    return assets.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


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
    payload to floor(len * (target_px / source_px)) bytes with a
    fixed stride — stable across runs, partitionings, and engines
    (floor, not round: Python's banker's rounding differs from SQL
    round-half-up exactly at .5, and the r4 registry oracle
    restates this size formula).
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
                n_out = max(int(len(content) * min(scale, 1.0)), 1)
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


#: PCM energy windowing: 64 samples per analysis window (full
#: windows only — the trailing partial window is dropped, the
#: standard frame-analysis convention).
AUDIO_WINDOW = 64

PCM_ENERGY_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("sum_sq", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", LongType()),
    ]
)


def pcm_energy_windows(assets: DataFrame, window: int = AUDIO_WINDOW) -> DataFrame:
    """Audio analysis pass: interpret each asset payload as PCM16
    little-endian mono (a REAL decode — PCM needs no codec
    library), split into fixed windows, and emit per-window energy
    (Σs², exact int64), RMS, and peak |s|. The real thing prepends
    a demuxer for containerized audio; the decode→window→reduce
    shape, Arrow batching, and output grain are identical.

    Float contract: sum_sq and peak are exact integers; rms =
    sqrt(sum_sq / window) is one int/int division + one correctly-
    rounded sqrt — bit-identical cross-engine."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, ssq, rms, peak = [], [], [], [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                buf = bytes(content)
                n = (len(buf) // 2) * 2
                samples = np.frombuffer(buf[:n], dtype="<i2").astype(np.int64)
                n_win = len(samples) // window
                if n_win == 0:
                    continue
                w = samples[: n_win * window].reshape(n_win, window)
                s2 = (w * w).sum(axis=1)
                pk = np.abs(w).max(axis=1)
                for i in range(n_win):
                    ids.append(aid)
                    widx.append(i)
                    ssq.append(int(s2[i]))
                    rms.append(math.sqrt(int(s2[i]) / window))
                    peak.append(int(pk[i]))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int64"),
                    "sum_sq": pd.Series(ssq, dtype="int64"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "peak": pd.Series(peak, dtype="int64"),
                }
            )

    return assets.mapInPandas(run, schema=PCM_ENERGY_SCHEMA)

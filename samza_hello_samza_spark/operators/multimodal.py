"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column with typed metadata alongside, and run
decode/feature-extract as Arrow-batched ``mapInPandas`` so each
Python worker sees columnar batches (never one row at a time).

The payload path is REAL for images and audio: documents are turned
into genuine PNG (even doc_ids) and WAV (odd doc_ids) payloads whose
pixels/samples derive from the text bytes, and ``multimodal_decode`` /
``multimodal_resize`` parse and transform those actual formats with
the pure-python codecs in ``functions/media.py`` (full PNG scanline
codec, RIFF/PCM walk — no PIL/librosa needed). Payloads the parser
doesn't recognize take a clearly-labeled deterministic fallback
(format='raw', pseudo-dims) instead of failing the job — that is the
remaining stub surface, along with video frame *decoding* in
``multimodal_frame_sample`` (WAV windows are real PCM slices; there is
no pure-python video codec) and the learned encoder behind
``multimodal_features``.

Rows-only driver check (binary+UDF is outside DuckDB SQL's surface);
determinism and true-dimension parsing are asserted in tests/ against
committed fixture files.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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

from ..functions import media
from ..session import load_table

PAYLOAD_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)


def _text_to_png(doc_id: int, data: bytes) -> bytes:
    """A real PNG whose size and pixels derive from the text bytes."""
    w = 4 + (len(data) % 13)
    h = 4 + (doc_id % 11)
    stride = w * 3
    src = data if data else b"\x00"
    rows = [
        bytes((src * ((stride // len(src)) + 2))[y * 3 : y * 3 + stride])
        for y in range(h)
    ]
    return media.png_encode(rows, w, h, channels=3)


def _text_to_wav(doc_id: int, data: bytes) -> bytes:
    """A real 16-bit mono WAV whose samples derive from the text bytes."""
    rate = 8000
    n = 200 + (len(data) % 800)
    src = data if data else b"\x00"
    frames = bytes((src * ((2 * n) // len(src) + 2))[: 2 * n])
    return media.wav_encode(frames, channels=1, sample_rate=rate, bits=16)


def _payload_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            _text_to_png(d, t) if d % 2 == 0 else _text_to_wav(d, t)
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads})


def media_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload): real PNGs (even ids) / WAVs (odd).

    Stands in for a parquet binary column of ingested media; everything
    downstream treats the payload as opaque bytes.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("text"),
    )
    return docs.mapInPandas(_payload_partition, PAYLOAD_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("checksum", LongType()),
    ]
)


def _decode_one(payload: bytes) -> media.MediaInfo:
    try:
        return media.parse_media(payload)
    except media.UnknownMediaError:
        # FALLBACK (stub surface): deterministic pseudo-dims for payloads
        # no parser recognizes — keeps heterogenous corpora flowing.
        crc = zlib.crc32(payload)
        return media.MediaInfo("raw", width=16 + crc % 1024, height=16 + (crc >> 10) % 1024)


def _decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        infos = [_decode_one(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "format": [m.format for m in infos],
                "width": pd.array([m.width for m in infos], dtype="Int32"),
                "height": pd.array([m.height for m in infos], dtype="Int32"),
                "channels": pd.array([m.channels for m in infos], dtype="Int32"),
                "sample_rate": pd.array([m.sample_rate for m in infos], dtype="Int32"),
                "duration_ms": pd.array([m.duration_ms for m in infos], dtype="Int64"),
                "checksum": [zlib.crc32(p) for p in pdf["payload"]],
            }
        )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode: real PNG/WAV header parsing per asset.

    Two chained Arrow stages (synthesize payload → decode), both
    executor-local: payloads never shuffle, output is one typed
    metadata row per asset.
    """
    return media_payloads(spark, sf_dir).mapInPandas(_decode_partition, DECODED_SCHEMA)


RESIZE_BOX = 16  # fit-within target for image resize / audio decimation ×2

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _resize_one(payload: bytes) -> tuple[str, bytes]:
    try:
        info = media.parse_media(payload)
    except media.UnknownMediaError:
        # FALLBACK (stub surface): proportional byte-slice for unknowns.
        return "raw", payload[: max(1, len(payload) // 2)]
    if info.format == "png":
        return "png", media.png_resize_nearest(payload, RESIZE_BOX)
    if info.format == "wav":
        return "wav", media.wav_decimate(payload, 2)
    return info.format, payload  # parseable but not transformable here


def _resize_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        resized = [_resize_one(p) for p in pdf["payload"]]
        infos = [_decode_one(p) for _, p in resized]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "format": [f for f, _ in resized],
                "width": pd.array([m.width for m in infos], dtype="Int32"),
                "height": pd.array([m.height for m in infos], dtype="Int32"),
                "sample_rate": pd.array([m.sample_rate for m in infos], dtype="Int32"),
                "payload": [p for _, p in resized],
            }
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: binary in → binary out, Arrow-batched.

    PNG payloads get a true nearest-neighbor resize (decode scanlines,
    sample, re-encode); WAVs get decimation resampling. The shape every
    media stage at 100 TB takes: payloads never leave the executor,
    output partitioning follows input (no shuffle), one vectorized
    Python pass per batch.
    """
    return media_payloads(spark, sf_dir).mapInPandas(_resize_partition, RESIZED_SCHEMA)


N_FRAMES = 4

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("pts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def _frame_sample_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame/window sampler: 1→N fan-out inside the executor.

    WAV payloads yield REAL evenly-spaced PCM windows (re-wrapped as
    standalone WAVs with true timestamps). Other payloads fall back to
    byte slices — the stub surface standing in for a video decoder
    (no pure-python codec exists; swap in pyav/ffmpeg)."""
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "pts_ms": [], "frame": []}
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            frames: list[tuple[int, bytes]] = []
            try:
                info = media.parse_media(bytes(p))
            except media.UnknownMediaError:
                info = None
            if info and info.format == "wav" and info.duration_ms:
                # slice the PCM into N windows with true pts
                for i in range(N_FRAMES):
                    pts = i * info.duration_ms // N_FRAMES
                    frames.append((pts, media.wav_window(bytes(p), i, N_FRAMES)))
            else:
                dur_ms = 1000 * (1 + len(p) % 60)  # fallback fake duration
                step = max(1, len(p) // N_FRAMES)
                for i in range(N_FRAMES):
                    frames.append((i * dur_ms // N_FRAMES, bytes(p[i * step : (i + 1) * step])))
            for i, (pts, fb) in enumerate(frames):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["pts_ms"].append(pts)
                out["frame"].append(fb)
        yield pd.DataFrame(out)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one asset row fans out to N frame/window rows."""
    return media_payloads(spark, sf_dir).mapInPandas(
        _frame_sample_partition, FRAMES_SCHEMA
    )


FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _features_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB feature extractor: FEATURE_DIM floats from rolling crc32
    (swap in a real vision/audio encoder). Output feeds the ANN
    operators (similarity.py) unchanged — decode → embed → index."""
    for pdf in batches:
        feats = []
        for p in pdf["payload"]:
            step = max(1, len(p) // FEATURE_DIM)
            vec = [
                (zlib.crc32(p[i * step : (i + 1) * step]) % 10_000) / 10_000.0
                for i in range(FEATURE_DIM)
            ]
            feats.append(vec)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "features": feats}
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: binary payload → fixed-size float vector."""
    return media_payloads(spark, sf_dir).mapInPandas(
        _features_partition, FEATURES_SCHEMA
    )


ORACLES: dict[str, str] = {}

QUERIES = {
    "multimodal_decode": multimodal_decode,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_features": multimodal_features,
}

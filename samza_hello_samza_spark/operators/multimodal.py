"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column with typed metadata alongside, and run
decode/feature-extract as Arrow-batched ``mapInPandas`` so each
Python worker sees columnar batches (never one row at a time).

The container has no image/audio libraries, so the *decode* step is a
deterministic fake (payload-derived pseudo-dimensions) behind
``_decode_batch`` — clearly marked; swap in PIL/librosa per modality.
The Spark-side plumbing (schema, batch shape, partitioning, UDF
signature) is real and tested.

Rows-only driver check (binary+UDF is outside DuckDB SQL's surface);
determinism is asserted in tests/.
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

from ..session import load_table

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def _decode_batch(payload: bytes) -> tuple[str, int, int]:
    """STUB decode — deterministic fake in place of a real image lib.

    Real deployments replace this with e.g. PIL.Image.open; the
    surrounding plumbing (binary column in, typed struct out, Arrow
    batching) is unchanged by that swap.
    """
    crc = zlib.crc32(payload)
    fmt = ("png", "jpeg", "webp")[crc % 3]
    return fmt, 16 + crc % 1024, 16 + (crc >> 10) % 1024


def _decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        meta = [_decode_batch(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "format": [m[0] for m in meta],
                "width": [m[1] for m in meta],
                "height": [m[2] for m in meta],
                "checksum": [zlib.crc32(p) for p in pdf["payload"]],
            }
        )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode pipeline over mapInPandas.

    documents.text stands in for the opaque payload (utf-8 bytes);
    with real media the payload column would come straight from
    parquet binary. Output is one typed metadata row per asset.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return payloads.mapInPandas(_decode_partition, DECODED_SCHEMA)


RESIZE_BOX = 256  # fit-within target for the resize stub

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _resize_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize: scale fake dims to fit RESIZE_BOX (aspect kept),
    shrink payload proportionally. Swap in PIL thumbnail for real media."""
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [], "payload": []}
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            _, w, h = _decode_batch(p)
            scale = min(1.0, RESIZE_BOX / max(w, h))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            keep = max(1, int(len(p) * scale))
            out["doc_id"].append(doc_id)
            out["width"].append(nw)
            out["height"].append(nh)
            out["payload"].append(bytes(p[:keep]))
        yield pd.DataFrame(out)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: binary in → binary out, Arrow-batched.

    The shape every media-processing stage at 100 TB takes: payloads
    never leave the executor, output partitioning follows input (no
    shuffle), and the Python stage is one vectorized pass per batch.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return payloads.mapInPandas(_resize_partition, RESIZED_SCHEMA)


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
    """STUB frame sampler: N evenly-spaced payload slices stand in for
    decoded video frames (swap in pyav/ffmpeg). 1→N fan-out happens
    inside the executor — mapInPandas output needn't be 1:1 with input."""
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "pts_ms": [], "frame": []}
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            dur_ms = 1000 * (1 + len(p) % 60)  # fake duration from payload
            step = max(1, len(p) // N_FRAMES)
            for i in range(N_FRAMES):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["pts_ms"].append(i * dur_ms // N_FRAMES)
                out["frame"].append(bytes(p[i * step : (i + 1) * step]))
        yield pd.DataFrame(out)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one asset row fans out to N frame rows."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return payloads.mapInPandas(_frame_sample_partition, FRAMES_SCHEMA)


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
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return payloads.mapInPandas(_features_partition, FEATURES_SCHEMA)


ORACLES: dict[str, str] = {}

QUERIES = {
    "multimodal_decode": multimodal_decode,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_features": multimodal_features,
}

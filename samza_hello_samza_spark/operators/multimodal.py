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


ORACLES: dict[str, str] = {}

QUERIES = {
    "multimodal_decode": multimodal_decode,
}

"""Blob sink (AzureBlobApplication analog): time partitioning, pruning,
blob-size bounding, avro fallback."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from samza_hello_samza_spark.session import load_table
from samza_hello_samza_spark.sources.blob_sink import (
    blob_sink,
    resolve_format,
    write_blobs,
)
from samza_hello_samza_spark.streaming.sources import events_stream
from tests.conftest import SF_DIR


def test_resolve_format_falls_back_without_avro_jar(spark):
    assert resolve_format(spark, "parquet") == "parquet"
    assert resolve_format(spark, "avro") in ("avro", "parquet")
    assert resolve_format(spark, "definitely-not-a-source") == "parquet"


def test_streaming_blob_sink_time_partitions(spark, tmp_path):
    out = str(tmp_path / "blobs")
    ck = str(tmp_path / "ck")
    q = blob_sink(events_stream(spark, SF_DIR), out, ck, fmt="parquet")
    q.awaitTermination(120)

    src = load_table(spark, SF_DIR, "events")
    back = spark.read.parquet(out)
    assert back.count() == src.count()

    # hive-style y=/m=/d=/h= layout exists
    parts = glob.glob(os.path.join(out, "y=*", "m=*", "d=*", "h=*"))
    assert parts, "expected y=/m=/d=/h= partition directories"

    # partition pruning: a time-range filter must hit PartitionFilters
    one = back.filter((F.col("y") == 1995) & (F.col("m") == 1))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "y" in plan.split("PartitionFilters")[1][:200]


def test_batch_write_blobs_bounds_blob_size(spark, tmp_path):
    out = str(tmp_path / "bounded")
    df = load_table(spark, SF_DIR, "events").limit(200).coalesce(1)
    write_blobs(df, out, max_records_per_blob=50)
    files = glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    assert files
    counts = [spark.read.parquet(f).count() for f in files]
    assert max(counts) <= 50, f"maxMessagesPerBlob analog violated: {counts}"
    assert sum(counts) == 200

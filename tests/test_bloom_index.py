"""Per-file Bloom sidecars: point lookups skip files, results exact."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from samza_hello_samza_spark.sources import bloom_index
from tests.conftest import SF_DIR


def _unclustered_table(spark, path, n=60_000, files=32):
    """Keys 0..n-1 scattered across date-ordered files: each file's key
    interval spans ~the whole domain (the zone-map-hostile layout)."""
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)) % 1000).alias("day"),
        (F.col("id") * 3).alias("payload"),
    )
    df.repartitionByRange(files, "day").write.mode("overwrite").parquet(path)
    return path


def test_bloom_point_scan_exact_and_prunes(spark, tmp_path):
    path = _unclustered_table(spark, os.path.join(str(tmp_path), "t"))
    bloom_index.build_file_blooms(spark, path, "k")
    n_files = len(spark.read.parquet(path).inputFiles())

    keys = [7, 31337, 59999]
    cand = bloom_index.bloom_candidate_files(spark, path, keys)
    # each key lives in exactly one file; blooms admit ≤ keys + fp tail
    assert 1 <= len(cand) < n_files / 4

    got = sorted(
        (r.k, r.payload)
        for r in bloom_index.bloom_point_scan(spark, path, "k", keys).collect()
    )
    want = sorted(
        (r.k, r.payload)
        for r in spark.read.parquet(path).filter(F.col("k").isin(keys)).collect()
    )
    assert got == want and len(got) == len(keys)


def test_bloom_absent_key_reads_nothing_or_fp_tail(spark, tmp_path):
    path = _unclustered_table(spark, os.path.join(str(tmp_path), "t"), n=20_000)
    bloom_index.build_file_blooms(spark, path, "k")
    n_files = len(spark.read.parquet(path).inputFiles())
    # absent keys: no false negatives needed — candidates are pure fp
    cand = bloom_index.bloom_candidate_files(
        spark, path, [10_000_000 + i for i in range(5)]
    )
    assert len(cand) <= max(1, n_files // 8)
    out = bloom_index.bloom_point_scan(spark, path, "k", [10_000_000]).collect()
    assert out == []


def test_bloom_meta_sizing_clamped_pow2(spark, tmp_path):
    path = _unclustered_table(spark, os.path.join(str(tmp_path), "t"), n=5_000)
    bloom_index.build_file_blooms(spark, path, "k")
    with open(bloom_index._meta_path(path)) as f:
        meta = json.load(f)
    nb = meta["n_bits"]
    assert bloom_index.FB_MIN_BITS <= nb <= bloom_index.FB_MAX_BITS
    assert nb & (nb - 1) == 0
    assert meta["col"] == "k" and meta["k"] == bloom_index.FB_K


def test_registered_lookup_matches_full_scan(spark):
    got = sorted(
        tuple(r)
        for r in bloom_index.orders_point_lookup_bloom(spark, SF_DIR).collect()
    )
    from samza_hello_samza_spark.session import load_table

    want = sorted(
        tuple(r)
        for r in load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey").isin(list(bloom_index.LOOKUP_KEYS)))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "o_orderstatus",
        )
        .collect()
    )
    assert got == want


def test_registered_lookup_prunes_files(spark):
    table_dir = bloom_index._date_clustered_orders(spark, SF_DIR)
    n_files = len(
        [
            f
            for f in spark.read.parquet(table_dir).inputFiles()
            if bloom_index.BLOOM_SIDECAR_DIRNAME not in f
        ]
    )
    cand = bloom_index.bloom_candidate_files(
        spark, table_dir, list(bloom_index.LOOKUP_KEYS)
    )
    assert len(cand) < n_files / 4

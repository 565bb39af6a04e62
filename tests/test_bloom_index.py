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


def test_bloom_refresh_new_files_folds_only_the_delta(spark, tmp_path):
    """Append maintenance (VERDICT r05 #5): after new files land, the
    delta fold builds filters for ONLY them — existing sidecar rows
    are untouched bytes — and probes for keys in BOTH generations are
    exact afterwards."""
    path = _unclustered_table(spark, os.path.join(str(tmp_path), "t"), n=30_000)
    bloom_index.build_file_blooms(spark, path, "k")
    before = {
        (r._file, r.word): r.bits
        for r in spark.read.parquet(bloom_index._sidecar_dir(path)).collect()
    }

    # append a new key generation as new files (no old file rewritten)
    delta = spark.range(1_000_000, 1_002_000).select(
        F.col("id").alias("k"),
        F.lit(5000).cast("long").alias("day"),
        (F.col("id") * 3).alias("payload"),
    )
    delta.coalesce(2).write.mode("append").parquet(path)

    n = bloom_index.refresh_new_files(spark, path)
    assert n == 2
    assert bloom_index.refresh_new_files(spark, path) == 0  # idempotent

    after = {
        (r._file, r.word): r.bits
        for r in spark.read.parquet(bloom_index._sidecar_dir(path)).collect()
    }
    # old rows carried over identical; new rows only for the 2 new files
    assert {kv: b for kv, b in after.items() if kv in before} == before
    new_files = {f for (f, _w) in set(after) - set(before)}
    assert len(new_files) == 2

    # probes spanning both generations are exact and still prune
    keys = [7, 1_000_001, 1_001_999]
    got = sorted(
        (r.k, r.payload)
        for r in bloom_index.bloom_point_scan(spark, path, "k", keys).collect()
    )
    want = sorted(
        (r.k, r.payload)
        for r in spark.read.parquet(path).filter(F.col("k").isin(keys)).collect()
    )
    assert got == want and len(got) == len(keys)
    n_files = len(spark.read.parquet(path).inputFiles())
    assert len(bloom_index.bloom_candidate_files(spark, path, keys)) < n_files / 4


def test_bloom_refresh_merged_buckets_composes_with_merge(spark, tmp_path):
    """MERGE composition (VERDICT r05 #5, mirroring test_zonemap.py's
    carryover test): after a partial merge, only the touched buckets'
    sidecar rows are rebuilt, untouched files' rows carry over
    identical, and the post-merge probe equals the exact filter."""
    from samza_hello_samza_spark.sources.merge import MergeTable

    t = MergeTable(spark, str(tmp_path / "mt"), "k", n_buckets=8)
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(20_000)], "k long, v long"
    )
    t.write_full(base)
    bloom_index.build_file_blooms(spark, t.path, "k")
    before = {
        (r._file, r.word): r.bits
        for r in spark.read.parquet(bloom_index._sidecar_dir(t.path)).collect()
    }

    src = spark.createDataFrame(
        [(i, 7_000_000 + i) for i in range(0, 20_000, 4000)] + [(90_001, 5)],
        "k long, v long",
    )
    stats = t.merge(src)
    touched = stats["buckets"]
    assert 0 < len(touched) < 8  # a real partial merge

    n = bloom_index.refresh_merged_buckets(spark, t.path, touched)
    assert n > 0
    # empty bucket list is a no-op, never a self-overwrite
    assert bloom_index.refresh_merged_buckets(spark, t.path, []) == 0

    after = {
        (r._file, r.word): r.bits
        for r in spark.read.parquet(bloom_index._sidecar_dir(t.path)).collect()
    }
    markers = [f"/_bucket={b}/" for b in touched]
    untouched_before = {
        kv: b for kv, b in before.items() if not any(m in kv[0] for m in markers)
    }
    untouched_after = {
        kv: b for kv, b in after.items() if not any(m in kv[0] for m in markers)
    }
    assert untouched_before == untouched_after  # carried over identical
    for f, _w in after:
        if any(m in f for m in markers):
            assert (f, _w) not in before  # touched dirs hold only NEW files

    # post-merge probe ≡ exact filter (upserted, inserted, untouched keys)
    keys = [0, 4000, 90_001, 13]
    got = sorted(
        (r.k, r.v)
        for r in bloom_index.bloom_point_scan(spark, t.path, "k", keys)
        .drop("_bucket")
        .collect()
    )
    want = sorted(
        (r.k, r.v)
        for r in spark.read.parquet(t.path)
        .filter(F.col("k").isin(keys))
        .drop("_bucket")
        .collect()
    )
    assert got == want and len(got) == len(keys)


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

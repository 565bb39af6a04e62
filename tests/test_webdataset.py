"""WebDataset tar-shard export/read: round-trip, determinism, pruning."""

from __future__ import annotations

import os
import tarfile

from pyspark.sql import functions as F

from samza_hello_samza_spark.operators.multimodal import media_payloads
from samza_hello_samza_spark.sources import webdataset as wd
from tests.conftest import SF_DIR


def _export(spark, tmp_path, ext_col=None):
    payloads = media_payloads(spark, SF_DIR).withColumn(
        "fmt", F.when(F.col("doc_id") % 2 == 0, "png").otherwise("wav")
    )
    out = str(tmp_path / "wds")
    man = wd.write_webdataset_shards(
        payloads, out, ext_col=ext_col, samples_per_shard=32
    )
    return payloads, out, man


def test_webdataset_round_trip_and_manifest(spark, tmp_path):
    """Every (key, payload) survives the tar round-trip byte-exact,
    per-row extensions ride along, and the manifest counts add up."""
    payloads, out, man = _export(spark, tmp_path, ext_col="fmt")
    back = wd.read_webdataset_shards(spark, out).collect()
    want = {
        r.doc_id: (r.fmt, bytes(r.payload)) for r in payloads.collect()
    }
    got = {r.key: (r.ext, bytes(r.payload)) for r in back}
    assert got == want
    assert sum(s["n_samples"] for s in man["shards"].values()) == len(want)
    # deterministic shard assignment: key // per
    for sid, s in man["shards"].items():
        assert int(s["key_min"]) // 32 == int(sid)
        assert int(s["key_max"]) // 32 == int(sid)
    assert man == wd.read_manifest(out)


def test_webdataset_shards_are_plain_tars_in_key_order(spark, tmp_path):
    """Shards must be consumable by a loader that knows ONLY stdlib
    tar (the whole point of the format): members are {key:012d}.{ext}
    in ascending key order, bytes deterministic across re-export."""
    _, out, man = _export(spark, tmp_path, ext_col="fmt")
    first = sorted(man["shards"])[0]
    fpath = os.path.join(out, man["shards"][first]["file"])
    with tarfile.open(fpath) as tf:
        names = [m.name for m in tf.getmembers()]
    assert names == sorted(names)
    assert all(n.endswith((".png", ".wav")) for n in names)
    before = open(fpath, "rb").read()
    # re-export over the same data: byte-identical shard
    _export(spark, tmp_path, ext_col="fmt")
    assert open(fpath, "rb").read() == before


def test_webdataset_shard_pruning(spark, tmp_path):
    """Reading one shard id touches one tar and yields exactly its
    manifest count — the resume-at-shard-k loader path."""
    _, out, man = _export(spark, tmp_path)
    sid = int(sorted(man["shards"])[1])
    rows = wd.read_webdataset_shards(spark, out, shard_ids=[sid]).collect()
    assert len(rows) == man["shards"][str(sid)]["n_samples"]
    assert all(r.key // 32 == sid for r in rows)
    assert all(r.ext == "bin" for r in rows)


def test_seal_matches_batch_export_and_is_incremental(spark, tmp_path):
    """Stage-then-seal across two batches produces byte-identical
    shards to a one-shot batch export; re-sealing with no new data
    rebuilds nothing; an appending batch rewrites ONLY its shard."""
    payloads = media_payloads(spark, SF_DIR)
    staging = str(tmp_path / "staging")
    out = str(tmp_path / "sealed")
    ref = str(tmp_path / "ref")

    lo = payloads.filter(F.col("doc_id") < 40)
    hi = payloads.filter(F.col("doc_id") >= 40)
    lo.write.mode("append").parquet(staging)
    r1 = wd.seal_webdataset_shards(spark, staging, out, samples_per_shard=32)
    hi.write.mode("append").parquet(staging)
    r2 = wd.seal_webdataset_shards(spark, staging, out, samples_per_shard=32)
    # shard 0 (keys 0..31) was complete after batch 1 → not rebuilt
    assert 0 in r1["rebuilt"] and 0 not in r2["rebuilt"]
    assert 1 in r1["rebuilt"] and 1 in r2["rebuilt"]  # split across batches

    wd.write_webdataset_shards(payloads, ref, samples_per_shard=32)
    ref_man = wd.read_manifest(ref)
    out_man = wd.read_manifest(out)
    assert out_man == ref_man
    for s in ref_man["shards"].values():
        a = open(os.path.join(ref, s["file"]), "rb").read()
        b = open(os.path.join(out, s["file"]), "rb").read()
        assert a == b, f"sealed shard {s['file']} differs from batch export"

    # idempotent re-seal: nothing rebuilt, bytes untouched
    before = {
        s["file"]: os.path.getmtime(os.path.join(out, s["file"]))
        for s in out_man["shards"].values()
    }
    r3 = wd.seal_webdataset_shards(spark, staging, out, samples_per_shard=32)
    assert r3["rebuilt"] == []
    after = {
        s["file"]: os.path.getmtime(os.path.join(out, s["file"]))
        for s in wd.read_manifest(out)["shards"].values()
    }
    assert after == before

"""JSONL shard export/reader: byte determinism, escaping round-trip,
listing-time pruning, and the registered audit key's oracle."""

from __future__ import annotations

import json
import os

import pytest

from samza_hello_samza_spark.sources import jsonl_sink
from tests.conftest import SF_DIR, assert_matches_oracle

SCHEMA = "doc_id BIGINT, text STRING, tag STRING"


def _frame(spark):
    rows = [
        (0, 'plain ascii', 'a'),
        (1, 'newline\nand "quotes" and \ttab', 'b'),
        (2, 'unicode: café — 中文', 'c'),
        (3, 'backslash \\ and / slash', 'd'),
        (7, 'last of shard one', 'e'),
        (8, 'first of shard two', 'f'),
        (17, 'sparse key', 'g'),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_roundtrip_and_canonical_bytes(spark, tmp_path):
    path = str(tmp_path / "jl")
    man = jsonl_sink.write_jsonl_shards(
        _frame(spark), path, key_col="doc_id", samples_per_shard=8
    )
    # shard assignment: key div 8 -> shards 0 (keys 0..7), 1 (8), 2 (17)
    assert sorted(man["shards"]) == ["0", "1", "2"]
    assert man["shards"]["0"]["n_samples"] == 5
    assert man["shards"]["0"]["key_min"] == 0
    assert man["shards"]["0"]["key_max"] == 7
    # bytes are canonical json, key-ordered, one object per line
    with open(os.path.join(path, "shard-000000.jsonl"), "rb") as f:
        lines = f.read().decode("utf-8").splitlines()
    assert len(lines) == 5
    objs = [json.loads(ln) for ln in lines]
    assert [o["doc_id"] for o in objs] == [0, 1, 2, 3, 7]
    # escaping round-trips exactly, including control chars + unicode
    assert objs[1]["text"] == 'newline\nand "quotes" and \ttab'
    assert objs[2]["text"] == 'unicode: café — 中文'
    # ensure_ascii: the shard bytes themselves are pure ASCII
    with open(os.path.join(path, "shard-000000.jsonl"), "rb") as f:
        assert max(f.read()) < 128
    # full read-back equals the source frame
    back = sorted(
        (r.doc_id, r.text, r.tag)
        for r in jsonl_sink.read_jsonl_shards(spark, path, SCHEMA).collect()
    )
    src = sorted((r.doc_id, r.text, r.tag) for r in _frame(spark).collect())
    assert back == src


def test_reexport_is_byte_identical(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    jsonl_sink.write_jsonl_shards(_frame(spark), p1, "doc_id", 8)
    jsonl_sink.write_jsonl_shards(_frame(spark), p2, "doc_id", 8)
    for s in ("shard-000000.jsonl", "shard-000001.jsonl", "shard-000002.jsonl"):
        with open(os.path.join(p1, s), "rb") as f1, open(
            os.path.join(p2, s), "rb"
        ) as f2:
            assert f1.read() == f2.read(), f"{s} not deterministic"


def test_read_prunes_at_listing(spark, tmp_path):
    path = str(tmp_path / "jl")
    jsonl_sink.write_jsonl_shards(_frame(spark), path, "doc_id", 8)
    # shard_ids selection
    only1 = jsonl_sink.read_jsonl_shards(spark, path, SCHEMA, shard_ids=[1])
    assert [r.doc_id for r in only1.collect()] == [8]
    # the pruned plan lists ONE file, not a filtered full scan
    assert only1.inputFiles() == [
        "file://" + os.path.join(path, "shard-000001.jsonl")
    ]
    # key_range is half-open ON KEYS: covering shards are listed
    # (pruning stays shard-granular) but out-of-range rows are trimmed
    rng = jsonl_sink.read_jsonl_shards(spark, path, SCHEMA, key_range=(7, 18))
    assert sorted(r.doc_id for r in rng.collect()) == [7, 8, 17]
    assert len(rng.inputFiles()) == 3  # shards 0,1,2 cover keys 7..17


def test_key_range_exact_semantics(spark, tmp_path):
    path = str(tmp_path / "jl")
    jsonl_sink.write_jsonl_shards(_frame(spark), path, "doc_id", 8)
    # empty half-open range: no shards selected, no rows returned
    empty = jsonl_sink.read_jsonl_shards(spark, path, SCHEMA, key_range=(8, 8))
    assert empty.count() == 0
    inverted = jsonl_sink.read_jsonl_shards(spark, path, SCHEMA, key_range=(9, 2))
    assert inverted.count() == 0
    # a range inside one shard returns exactly its keys, one file read
    one = jsonl_sink.read_jsonl_shards(spark, path, SCHEMA, key_range=(1, 3))
    assert sorted(r.doc_id for r in one.collect()) == [1, 2]
    assert len(one.inputFiles()) == 1
    # full-corpus range round-trips everything
    full = jsonl_sink.read_jsonl_shards(spark, path, SCHEMA, key_range=(0, 100))
    assert full.count() == _frame(spark).count()


def test_negative_keys_rejected(spark, tmp_path):
    bad = spark.createDataFrame([(-1, "x", "t")], SCHEMA)
    with pytest.raises(Exception, match="must be >= 0"):
        jsonl_sink.write_jsonl_shards(bad, str(tmp_path / "neg"), "doc_id", 8)


def test_audit_key_matches_oracle(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        jsonl_sink.QUERIES["jsonl_export_audit"],
        jsonl_sink.ORACLES["jsonl_export_audit"],
    )


def test_audit_detects_corruption(spark, tmp_path, monkeypatch):
    """Flip one byte in one shard: the audit's checksum for that shard
    must move — the integrity contract the key exists for."""
    import samza_hello_samza_spark.operators.ann_index as ann_index

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    before = {
        r.shard_id: r.content_checksum
        for r in jsonl_sink.jsonl_export_audit(spark, SF_DIR).collect()
    }
    root = os.path.join(
        ann_index._index_root(), ann_index._tag(SF_DIR), "jsonl_export", "data"
    )
    shard = next(
        os.path.join(root, f)
        for f in sorted(os.listdir(root))
        if f.endswith(".jsonl")
    )
    with open(shard, "rb") as f:
        data = bytearray(f.read())
    # flip a byte inside the first line's text payload
    idx = data.index(b'"text":"') + len(b'"text":"')
    data[idx] = data[idx] ^ 0x01
    with open(shard, "wb") as f:
        f.write(bytes(data))
    after = {
        r.shard_id: r.content_checksum
        for r in jsonl_sink.jsonl_export_audit(spark, SF_DIR).collect()
    }
    assert before != after, "audit failed to notice a flipped byte"


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @given(
        texts=st.lists(
            st.text(max_size=40),  # arbitrary unicode incl. controls
            min_size=1,
            max_size=6,
        )
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_any_unicode_text_roundtrips(spark, tmp_path_factory, texts):
        """Property: EVERY unicode payload survives serialize → frame →
        parse byte-exactly (the JSON escaping layer is the whole
        framing guarantee — newlines, quotes, controls, surrogates
        excluded by json itself)."""
        path = str(tmp_path_factory.mktemp("jl"))
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
        )
        jsonl_sink.write_jsonl_shards(df, path, "doc_id", 4)
        back = {
            r.doc_id: r.text
            for r in jsonl_sink.read_jsonl_shards(
                spark, path, "doc_id BIGINT, text STRING"
            ).collect()
        }
        assert back == {i: t for i, t in enumerate(texts)}


def test_audit_checksum_is_null_distinct(spark):
    """ADVICE r08: two rows differing only in WHICH field is null (or
    null vs empty) must checksum differently — concat_ws would drop
    the null and collide them."""
    from pyspark.sql import functions as F

    schema = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, text STRING"
    rows = [
        (1, None, "x", 5, "t"),   # lang null
        (1, "x", None, 5, "t"),   # source null (same concat under ws-drop)
        (1, "", "x", 5, "t"),     # empty vs null lang
        (1, None, None, 5, "t"),  # both null
    ]
    df = spark.createDataFrame(rows, schema)
    sums = [
        r.h
        for r in df.select(
            jsonl_sink._md5_slice32(jsonl_sink._audit_content()).alias("h")
        ).collect()
    ]
    assert len(set(sums)) == len(sums), sums

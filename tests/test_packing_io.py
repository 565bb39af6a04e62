"""Materialized sequence packing: budget exactness, boundary metadata,
token content vs a pure-Python reference tokenizer, shard round-trip,
and the DuckDB oracle for the registered audit key."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.operators import packing_io
from samza_hello_samza_spark.operators.text_filters import (
    SEQ_BUDGET,
    sequence_packing,
)
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.fixture(scope="module")
def packed(spark):
    return packing_io.packed_sequences(spark, SF_DIR).collect()


def test_every_sequence_but_the_last_is_exactly_budget(packed):
    max_seq = max(r.seq_id for r in packed)
    for r in packed:
        if r.seq_id < max_seq:
            assert len(r.input_ids) == SEQ_BUDGET, r.seq_id
        else:
            assert 0 < len(r.input_ids) <= SEQ_BUDGET
    # seq ids are contiguous from 0 — no gaps, nothing dropped
    assert sorted(r.seq_id for r in packed) == list(range(max_seq + 1))


def test_boundary_metadata_is_consistent(packed):
    """doc_offsets start at 0, strictly increase, and the flattened
    slice sizes reconstruct them exactly — per-doc spans tile the
    sequence with no gap or overlap."""
    for r in packed:
        offs = list(r.doc_offsets)
        assert offs[0] == 0
        assert all(b > a for a, b in zip(offs, offs[1:]))
        assert len(offs) == len(r.doc_ids)
        assert offs[-1] < len(r.input_ids)


def test_total_token_conservation_and_assignment_agreement(spark, packed):
    asg = {r.doc_id: r for r in sequence_packing(spark, SF_DIR).collect()}
    total_expected = sum(a.n_tokens for a in asg.values())
    assert sum(len(r.input_ids) for r in packed) == total_expected

    # each doc's FIRST slice lands exactly where the assignment says
    first: dict[int, tuple[int, int]] = {}
    per_doc_tokens: dict[int, int] = {}
    for r in packed:
        offs = list(r.doc_offsets) + [None]
        for i, d in enumerate(r.doc_ids):
            size = (
                offs[i + 1] - offs[i]
                if offs[i + 1] is not None
                else len(r.input_ids) - offs[i]
            )
            per_doc_tokens[d] = per_doc_tokens.get(d, 0) + size
            if d not in first or r.seq_id < first[d][0]:
                first[d] = (r.seq_id, offs[i])
    for d, a in asg.items():
        if a.n_tokens > 0:
            assert first[d] == (a.seq_id, a.offset_in_seq), d
            assert per_doc_tokens[d] == a.n_tokens, d


def test_token_ids_match_reference_tokenizer(spark, packed):
    """The first documents' md5-slice32 token ids must appear verbatim
    as the prefix of the assembled global stream (re.ASCII mirrors
    Java's default ASCII \\s/\\w classes)."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .orderBy("doc_id")
        .limit(3)
        .collect()
    )
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", re.ASCII)
    want = [
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for d in docs
        for t in pat.findall(d.text)
    ]
    assert want, "fixture docs unexpectedly tokenless"
    stream: list[int] = []
    for r in sorted(packed, key=lambda r: r.seq_id):
        stream.extend(r.input_ids)
        if len(stream) >= len(want):
            break
    assert stream[: len(want)] == want


def test_write_packed_shards_roundtrip(spark, tmp_path):
    ps = packing_io.packed_sequences(spark, SF_DIR)
    out = str(tmp_path / "shards")
    packing_io.write_packed_shards(ps, out, seqs_per_shard=32)
    back = spark.read.parquet(out)
    # shard k holds exactly its contiguous seq range
    assert (
        back.filter(
            F.floor(F.col("seq_id") / 32).cast("long") != F.col("_shard").cast("long")
        ).count()
        == 0
    )
    a = {
        r.seq_id: (list(r.input_ids), list(r.doc_ids), list(r.doc_offsets))
        for r in back.collect()
    }
    b = {
        r.seq_id: (list(r.input_ids), list(r.doc_ids), list(r.doc_offsets))
        for r in ps.collect()
    }
    assert a == b


def test_materialize_matches_oracle(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        packing_io.sequence_packing_materialize,
        packing_io.ORACLES["sequence_packing_materialize"],
    )


def _scanned_partitions(df) -> int:
    plan = df._jdf.queryExecution().executedPlan()
    try:
        plan = plan.initialPlan()
    except Exception:
        pass
    node = plan.collectLeaves().apply(0)
    node.selectedPartitions()
    return int(node.metrics().get("numPartitions").get().value())


def test_read_packed_range_prunes_shards(spark, tmp_path):
    """The loader seam reads only the shard partitions overlapping its
    seq range, and returns exactly those sequences."""
    ps = packing_io.packed_sequences(spark, SF_DIR)
    out = str(tmp_path / "shards")
    packing_io.write_packed_shards(ps, out, seqs_per_shard=2)
    n_seq = ps.count()
    assert n_seq >= 8, "fixture corpus too small for a multi-shard range test"

    got = packing_io.read_packed_range(spark, out, 2, 8, seqs_per_shard=2)
    assert sorted(r.seq_id for r in got.collect()) == list(range(2, 8))
    n_parts = _scanned_partitions(
        spark.read.parquet(out).filter(F.col("_shard").between(1, 3))
    )
    assert n_parts == 3, f"expected 3 shard partitions, scanned {n_parts}"


# -- curriculum-keyed packing (§7.19) ----------------------------------------


@pytest.fixture(scope="module")
def packed_cur(spark):
    return packing_io.packed_sequences_curriculum(spark, SF_DIR).collect()


def test_curriculum_cells_pack_independently_to_budget(spark, packed_cur):
    """Within every (lang, stage) cell: contiguous seq ids from 0 and
    every sequence but the cell's last exactly at budget — and no
    token ever crosses a cell boundary (cells tile the corpus)."""
    from samza_hello_samza_spark.operators.text_filters import (
        sequence_packing_curriculum,
    )

    cells: dict[tuple, list] = {}
    for r in packed_cur:
        cells.setdefault((r.lang, r.stage), []).append(r)
    assert len(cells) > 4  # a real multi-cell corpus
    for (lang, stage), rows in cells.items():
        max_seq = max(r.seq_id for r in rows)
        assert sorted(r.seq_id for r in rows) == list(range(max_seq + 1))
        for r in rows:
            if r.seq_id < max_seq:
                assert len(r.input_ids) == SEQ_BUDGET, (lang, stage, r.seq_id)
            else:
                assert 0 < len(r.input_ids) <= SEQ_BUDGET

    # token conservation against the assignment, per cell
    asg = sequence_packing_curriculum(spark, SF_DIR).collect()
    want = {}
    for a in asg:
        want[(a.lang, a.stage)] = want.get((a.lang, a.stage), 0) + a.n_tokens
    got = {
        cell: sum(len(r.input_ids) for r in rows) for cell, rows in cells.items()
    }
    assert got == {c: n for c, n in want.items() if n > 0}


def test_curriculum_materialize_matches_oracle(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        packing_io.sequence_packing_curriculum_materialize,
        packing_io.ORACLES["sequence_packing_curriculum_materialize"],
    )


def test_read_packed_stage_prunes_to_one_cell(spark, tmp_path):
    """The curriculum loader lists only the requested (lang, stage)
    cell's overlapping shard dirs — partition pruning on all three
    keys — and returns exactly that cell's seq range."""
    ps = packing_io.packed_sequences_curriculum(spark, SF_DIR)
    out = str(tmp_path / "cur_shards")
    packing_io.write_packed_shards_curriculum(ps, out, seqs_per_shard=2)

    # pick the widest cell so the range test is meaningful
    top = (
        ps.groupBy("lang", "stage")
        .agg(F.max("seq_id").alias("m"))
        .orderBy(F.desc("m"))
        .first()
    )
    lang, stage, m = top.lang, top.stage, int(top.m)
    assert m >= 5, "fixture corpus too small for a multi-shard cell"

    got = packing_io.read_packed_stage(
        spark, out, lang, stage, 2, 6, seqs_per_shard=2
    )
    rows = got.collect()
    assert sorted(r.seq_id for r in rows) == list(range(2, 6))
    assert all(r.lang == lang and r.stage == stage for r in rows)

    total_parts = _scanned_partitions(spark.read.parquet(out))
    pruned_parts = _scanned_partitions(
        spark.read.parquet(out)
        .filter((F.col("lang") == lang) & (F.col("stage") == stage))
        .filter(F.col("_shard").between(1, 2))
    )
    assert pruned_parts == 2 and total_parts > pruned_parts

    # round-trip: the cell's shard content equals the assembled frame
    a = {
        r.seq_id: (list(r.input_ids), list(r.doc_ids))
        for r in spark.read.parquet(out)
        .filter((F.col("lang") == lang) & (F.col("stage") == stage))
        .collect()
    }
    b = {
        r.seq_id: (list(r.input_ids), list(r.doc_ids))
        for r in ps.filter(
            (F.col("lang") == lang) & (F.col("stage") == stage)
        ).collect()
    }
    assert a == b


# -- WebDataset composition (§7.35: packed shards ⇄ loader tars) ------------


def test_packed_webdataset_roundtrip_byte_exact(spark, tmp_path):
    """export → untar → decode reproduces every sequence exactly
    (ids, boundaries), and re-export of unchanged data is
    byte-identical per tar shard."""
    import os

    from samza_hello_samza_spark.sources import webdataset as wds

    ps = packing_io.packed_sequences(spark, SF_DIR)
    out = str(tmp_path / "tars")
    wds.export_packed_webdataset(ps, out, seqs_per_shard=2)
    back = wds.read_packed_webdataset(spark, out, seqs_per_shard=2)
    a = {
        r.seq_id: (list(r.input_ids), list(r.doc_ids), list(r.doc_offsets))
        for r in back.collect()
    }
    b = {
        r.seq_id: (list(r.input_ids), list(r.doc_ids), list(r.doc_offsets))
        for r in ps.collect()
    }
    assert a == b

    tar_bytes = {
        f: open(os.path.join(out, f), "rb").read()
        for f in os.listdir(out)
        if f.endswith(".tar")
    }
    assert len(tar_bytes) >= 2, "fixture corpus must span several tars"
    wds.export_packed_webdataset(ps, out, seqs_per_shard=2)
    for f, blob in tar_bytes.items():
        assert open(os.path.join(out, f), "rb").read() == blob, (
            f"re-export changed unchanged shard {f}"
        )


def test_read_packed_webdataset_prunes_tar_files(spark, tmp_path):
    """A [lo, hi) range opens only the overlapping tar files — the
    listing itself is cut, not post-filtered."""
    from samza_hello_samza_spark.sources import webdataset as wds

    ps = packing_io.packed_sequences(spark, SF_DIR)
    out = str(tmp_path / "tars")
    wds.export_packed_webdataset(ps, out, seqs_per_shard=2)
    got = wds.read_packed_webdataset(spark, out, 2, 8, seqs_per_shard=2)
    assert sorted(r.seq_id for r in got.collect()) == list(range(2, 8))
    files = {
        r.f.rsplit("/", 1)[-1]
        for r in spark.read.format("binaryFile")
        .load([f"{out}/shard-{s:06d}.tar" for s in (1, 2, 3)])
        .selectExpr("path AS f")
        .collect()
    }
    assert files == {"shard-000001.tar", "shard-000002.tar", "shard-000003.tar"}


def test_packed_webdataset_audit_matches_oracle(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        packing_io.packed_webdataset_audit,
        packing_io.ORACLES["packed_webdataset_audit"],
    )

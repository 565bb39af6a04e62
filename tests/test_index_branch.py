"""Index branches (write-audit-publish) + the per-family store facades.

Table-side parity: `VersionedMergeTable` grew branches/WAP in r05
(tests/test_merge.py); this suite pins the index-side mirror —
`branch_index` is a zero-copy hardlink clone with path-rewritten
manifests, every ann_index primitive works ON the branch, main is
untouched until `merge_index_branch` publishes the branch's file set
as one commit, and pinned pre-promote readers keep their snapshot.
Facade tests assert pure delegation for the LSH / PQ / IVFPQ handles
(`vector_store` siblings of `IvfVectorStore`).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.operators import ann_index, similarity
from samza_hello_samza_spark.operators.vector_store import (
    IvfPqVectorStore,
    IvfVectorStore,
    LshVectorStore,
    PqVectorStore,
)
from tests.conftest import SF_DIR

NLIST = similarity.IVF_NLIST
DIM = 64


def _vec(seed):
    v = np.random.default_rng(seed).normal(size=DIM)
    return [float(x) for x in v / np.linalg.norm(v)]


def _vec_df(spark, vec_id, vec):
    return spark.createDataFrame(
        [(int(vec_id), [float(x) for x in vec])], "vec_id BIGINT, v ARRAY<DOUBLE>"
    )


def _ids(spark, idx, qvec):
    return {
        r.vec_id
        for r in ann_index.probe_ivf_snapshot(spark, idx, qvec, NLIST).collect()
    }


def test_branch_diverges_audits_and_publishes(spark, tmp_path):
    """The full WAP loop: branch → maintain + validate on the branch
    (main untouched) → merge back publishes the branch state in one
    commit; a reader pinned to the pre-promote main manifest keeps
    the old state."""
    store = IvfVectorStore.create(spark, SF_DIR, NLIST, out_dir=str(tmp_path / "ivf"))
    idx = store.index_dir
    qvec = similarity._query_vector(spark, SF_DIR)
    before = _ids(spark, idx, qvec)
    man_pre = store.manifest()

    br = store.create_branch("wap")
    assert store.branches() == ["wap"]

    # WRITE on the branch only: upsert one vector, delete another,
    # rebalance (the rebuild being audited), append a new id
    victim = sorted(before)[0]
    br_idx = br.index_dir
    ann_index.upsert_ivf_vectors(spark, br_idx, _vec_df(spark, 3, _vec(33)))
    ann_index.delete_ivf_vectors(spark, br_idx, [victim])
    ann_index.rebalance_ivf_index(spark, br_idx)
    ann_index.append_ivf_index(spark, br_idx, _vec_df(spark, 777_000, _vec(7)))
    ann_index.commit_index_snapshot(f"{br_idx}/corpus")

    # AUDIT on the branch: expected membership
    br_ids = _ids(spark, br_idx, qvec)
    assert victim not in br_ids and 777_000 in br_ids
    assert br_ids == (before - {victim}) | {777_000}

    # main is byte-for-byte untouched
    assert _ids(spark, idx, qvec) == before
    assert store.manifest()["version"] == man_pre["version"]

    # PUBLISH: one commit, branch state becomes main's current
    stats = store.merge_branch("wap")
    assert stats["version"] == man_pre["version"] + 1
    assert _ids(spark, idx, qvec) == br_ids
    # the branch's rebalanced centroids came along
    assert "centroids" in store.manifest()
    # the upserted vector's new value is served on main
    got = (
        store.scan().filter(F.col("vec_id") == 3).collect()[0].v
    )
    assert got == pytest.approx(_vec(33))

    # pinned pre-promote reader: original files, original mask
    pinned = _ids(
        spark, idx, qvec
    )  # current == branch state (checked above); now pin:
    old_ids = {
        r.vec_id
        for r in ann_index.probe_ivf_snapshot(
            spark, idx, qvec, NLIST, man=man_pre
        ).collect()
    }
    assert old_ids == before and pinned == br_ids


def test_branch_survives_main_vacuum(spark, tmp_path):
    """Hardlinked data: vacuuming retired files on main must not break
    the branch's reads (each side holds its own reference)."""
    store = IvfVectorStore.create(spark, SF_DIR, NLIST, out_dir=str(tmp_path / "ivf"))
    qvec = similarity._query_vector(spark, SF_DIR)
    br = store.create_branch("keep")
    before_br = _ids(spark, br.index_dir, qvec)

    # main rebalances (retires its whole old file set) and vacuums
    ann_index.rebalance_ivf_index(spark, store.index_dir)
    store.expire_versions(keep_last=1)
    store.vacuum()

    assert _ids(spark, br.index_dir, qvec) == before_br, (
        "main's vacuum reclaimed files the branch still references"
    )


def test_branch_name_validation_and_handles(spark, tmp_path):
    store = IvfVectorStore.create(spark, SF_DIR, NLIST, out_dir=str(tmp_path / "ivf"))
    with pytest.raises(ValueError):
        store.create_branch("a/b")
    with pytest.raises(KeyError):
        store.branch("nope")
    store.create_branch("b1")
    with pytest.raises(FileExistsError):
        store.create_branch("b1")
    assert store.branch("b1").index_dir.endswith("_branches/b1")


# -- per-family facades: pure delegation ----------------------------------


def test_lsh_store_facade_delegates(spark, tmp_path):
    store = LshVectorStore.create(
        spark, SF_DIR, similarity.PLANES, similarity.LSH_BAND_BITS,
        out_dir=str(tmp_path / "lsh"),
    )
    qvec = similarity._query_vector(spark, SF_DIR)
    want = {
        r.vec_id
        for r in ann_index.probe_lsh_snapshot(
            spark, store.index_dir, qvec, similarity.PLANES, similarity.LSH_BAND_BITS
        ).collect()
    }
    assert {r.vec_id for r in store.probe(qvec).collect()} == want
    store.append(_vec_df(spark, 888_000, qvec))
    assert 888_000 in {r.vec_id for r in store.probe(qvec).collect()}
    store.delete([888_000])
    assert 888_000 not in {r.vec_id for r in store.probe(qvec).collect()}
    assert len(store.versions()) >= 3  # create + append + delete commits


def test_pq_store_facade_delegates(spark, tmp_path):
    store = PqVectorStore.create(
        spark, SF_DIR, similarity.PQ_M, similarity.PQ_KSUB,
        out_dir=str(tmp_path / "pq"),
    )
    qvec = similarity._query_vector(spark, SF_DIR)
    want = [
        r.vec_id
        for r in ann_index.probe_pq_snapshot(
            spark, store.index_dir, qvec, similarity.PQ_CANDIDATES
        ).collect()
    ]
    got = [r.vec_id for r in store.probe(qvec, similarity.PQ_CANDIDATES).collect()]
    assert got == want
    store.append(_vec_df(spark, 889_000, qvec))
    # the appended row is in the committed codes snapshot (top-k
    # membership depends on ADC rank, so assert at the snapshot level)
    snap = ann_index.snapshot_scan(spark, store.codes_dir)
    assert snap.filter(F.col("vec_id") == 889_000).count() == 1
    assert len(store.versions()) >= 2


def test_ivfpq_store_facade_delegates(spark, tmp_path):
    store = IvfPqVectorStore.create(
        spark, SF_DIR, NLIST, similarity.PQ_M, similarity.PQ_KSUB,
        out_dir=str(tmp_path / "ivfpq"),
    )
    qvec = similarity._query_vector(spark, SF_DIR)
    want = [
        r.vec_id
        for r in ann_index.probe_ivfpq_index(
            spark, store.index_dir, qvec, similarity.IVF_NPROBE,
            similarity.PQ_CANDIDATES,
        ).collect()
    ]
    got = [
        r.vec_id
        for r in store.probe(
            qvec, similarity.IVF_NPROBE, similarity.PQ_CANDIDATES
        ).collect()
    ]
    assert got == want
    store.append(_vec_df(spark, 890_000, qvec))
    assert len(store.versions()) >= 2


def test_restore_across_probe_families(spark, tmp_path):
    """RESTORE parity on every facade: an append rolls back to the
    pre-append snapshot as a NEW commit, and a later listing commit
    does not resurrect the superseded files."""
    qvec = similarity._query_vector(spark, SF_DIR)

    lsh = LshVectorStore.create(
        spark, SF_DIR, similarity.PLANES, similarity.LSH_BAND_BITS,
        out_dir=str(tmp_path / "lshr"),
    )
    v1 = ann_index.read_index_manifest(lsh.index_dir)["version"]
    lsh.append(_vec_df(spark, 901_000, qvec))
    assert 901_000 in {r.vec_id for r in lsh.probe(qvec).collect()}
    lsh.restore(v1)
    assert 901_000 not in {r.vec_id for r in lsh.probe(qvec).collect()}
    ann_index.commit_index_snapshot(lsh.index_dir)
    assert 901_000 not in {r.vec_id for r in lsh.probe(qvec).collect()}

    pq = PqVectorStore.create(
        spark, SF_DIR, similarity.PQ_M, similarity.PQ_KSUB,
        out_dir=str(tmp_path / "pqr"),
    )
    v1 = ann_index.read_index_manifest(pq.codes_dir)["version"]
    pq.append(_vec_df(spark, 902_000, qvec))
    snap = ann_index.snapshot_scan(spark, pq.codes_dir)
    assert snap.filter(F.col("vec_id") == 902_000).count() == 1
    pq.restore(v1)
    snap = ann_index.snapshot_scan(spark, pq.codes_dir)
    assert snap.filter(F.col("vec_id") == 902_000).count() == 0

    ivfpq = IvfPqVectorStore.create(
        spark, SF_DIR, NLIST, similarity.PQ_M, similarity.PQ_KSUB,
        out_dir=str(tmp_path / "ivfpqr"),
    )
    v1 = ann_index.read_index_manifest(ivfpq.codes_dir)["version"]
    ivfpq.append(_vec_df(spark, 903_000, qvec))
    ivfpq.restore(v1)
    snap = ann_index.snapshot_scan(spark, ivfpq.codes_dir)
    assert snap.filter(F.col("vec_id") == 903_000).count() == 0

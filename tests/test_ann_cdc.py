"""CDC → ANN: a base table's committed changes fold into its IVF index.

The end-to-end vector-store ingest story: embeddings live in a
`VersionedMergeTable`; MERGE/DELETE commits flow into the serving
index via `maintenance.ann_cdc_apply` — net-change reduction, COW
upserts, tombstone deletes, cursor-gated exactly-once.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.operators import ann_index, similarity
from samza_hello_samza_spark.sources.merge import VersionedMergeTable
from samza_hello_samza_spark.streaming.maintenance import ann_cdc_apply
from tests.conftest import SF_DIR

NLIST = similarity.IVF_NLIST
DIM = 64


def _setup(spark, tmp_path):
    """Index + table over the same initial rows."""
    idx = ann_index.build_ivf_index(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / "ivf")
    )
    ann_index.commit_index_snapshot(f"{idx}/corpus")
    base = ann_index.snapshot_scan(spark, f"{idx}/corpus").select("vec_id", "v")
    table = VersionedMergeTable(
        spark, str(tmp_path / "emb_table"), key_col="vec_id", n_buckets=8
    )
    table.write_full(base)
    return idx, table


def _probe_map(spark, idx):
    qvec = similarity._query_vector(spark, SF_DIR)
    rows = ann_index.probe_ivf_snapshot(spark, idx, qvec, NLIST).collect()
    return {r.vec_id: np.asarray(r.v) for r in rows}


def _vec(seed):
    v = np.random.default_rng(seed).normal(size=DIM)
    return [float(x) for x in v / np.linalg.norm(v)]


def test_cdc_apply_tracks_table_and_is_exactly_once(spark, tmp_path):
    idx, table = _setup(spark, tmp_path)
    v0 = table.versions()[-1]

    # commit 1: update two vectors, insert a new id
    upd_ids = [3, 7]
    new_rows = [(i, _vec(i)) for i in upd_ids] + [(900_000, _vec(99))]
    table.merge(spark.createDataFrame(new_rows, "vec_id BIGINT, v ARRAY<DOUBLE>"))
    # commit 2: delete two other ids (one of them just-updated — the
    # NET change for id 3 must be the delete)
    table.delete_where(F.col("vec_id").isin([3, 11]))

    stats = ann_cdc_apply(spark, table, idx, from_version=v0)
    assert stats["cursor"] == table.versions()[-1]
    assert stats["n_deleted"] == 2 and stats["n_upserted"] == 2  # 7 + 900000

    got = _probe_map(spark, idx)
    want = {r.vec_id: np.asarray(r.v) for r in table.read().collect()}
    assert set(got) == set(want)
    np.testing.assert_allclose(got[7], np.asarray(_vec(7)), rtol=1e-12)
    np.testing.assert_allclose(got[900_000], np.asarray(_vec(99)), rtol=1e-12)
    assert 3 not in got and 11 not in got

    # replay at the cursor: no-op
    again = ann_cdc_apply(spark, table, idx)
    assert again["applied"] == 0
    assert set(_probe_map(spark, idx)) == set(want)


def test_cdc_apply_replay_after_cursor_loss_is_idempotent(spark, tmp_path):
    """Crash-replay: rewind the cursor (as if the final commit was
    lost) and re-apply the same range — the index state must be
    byte-identical, because tombstones and COW upserts are
    idempotent."""
    idx, table = _setup(spark, tmp_path)
    corpus = f"{idx}/corpus"
    v0 = table.versions()[-1]
    table.merge(
        spark.createDataFrame([(5, _vec(5)), (901_000, _vec(42))],
                              "vec_id BIGINT, v ARRAY<DOUBLE>")
    )
    table.delete_where(F.col("vec_id") == 9)

    ann_cdc_apply(spark, table, idx, from_version=v0)
    state_1 = _probe_map(spark, idx)

    # lose the cursor commit: rewind to v0 and re-apply everything
    man = ann_index.read_index_manifest(corpus)
    ann_index.commit_index_files(corpus, man["files"], extra={"cdc_cursor": v0})
    stats = ann_cdc_apply(spark, table, idx)
    assert stats["applied"] > 0, "rewound cursor must re-apply"
    state_2 = _probe_map(spark, idx)

    assert set(state_1) == set(state_2)
    for k in state_1:
        np.testing.assert_allclose(state_1[k], state_2[k], rtol=1e-12)


def test_cdc_apply_requires_a_seed_cursor(spark, tmp_path):
    idx, table = _setup(spark, tmp_path)
    table.merge(
        spark.createDataFrame([(1, _vec(1))], "vec_id BIGINT, v ARRAY<DOUBLE>")
    )
    with pytest.raises(ValueError, match="from_version"):
        ann_cdc_apply(spark, table, idx)


def test_cdc_apply_absorbs_restore_exactly_once(spark, tmp_path):
    """r08 (VERDICT #1): a base-table RESTORE flows into the serving
    index like any commit — the net-change reduction (last commit
    wins per key) absorbs the rollback batch (updated vectors revert,
    the inserted id leaves, the deleted id returns), the index equals
    the restored snapshot, and a cursor-loss replay of the restore
    range is idempotent."""
    idx, table = _setup(spark, tmp_path)
    corpus = f"{idx}/corpus"
    v0 = table.versions()[-1]
    want_v0 = {r.vec_id: np.asarray(r.v) for r in table.read().collect()}

    # mutations: update 3 and 7, insert 900000, delete 11
    table.merge(
        spark.createDataFrame(
            [(3, _vec(3)), (7, _vec(7)), (900_000, _vec(99))],
            "vec_id BIGINT, v ARRAY<DOUBLE>",
        )
    )
    table.delete_where(F.col("vec_id") == 11)
    ann_cdc_apply(spark, table, idx, from_version=v0)
    got_mut = _probe_map(spark, idx)
    assert 900_000 in got_mut and 11 not in got_mut

    # RESTORE to the pre-mutation version: the index must follow
    table.restore(v0)
    stats = ann_cdc_apply(spark, table, idx)
    assert stats["applied"] > 0
    got = _probe_map(spark, idx)
    assert set(got) == set(want_v0)  # 900000 gone, 11 back
    for k in want_v0:
        np.testing.assert_allclose(got[k], want_v0[k], rtol=1e-12)

    # replay at the cursor: no-op
    assert ann_cdc_apply(spark, table, idx)["applied"] == 0

    # cursor-loss replay across the whole mutation+restore range:
    # tombstones and COW upserts are idempotent, state identical
    man = ann_index.read_index_manifest(corpus)
    ann_index.commit_index_files(corpus, man["files"], extra={"cdc_cursor": v0})
    stats = ann_cdc_apply(spark, table, idx)
    assert stats["applied"] > 0
    got2 = _probe_map(spark, idx)
    assert set(got2) == set(want_v0)
    for k in want_v0:
        np.testing.assert_allclose(got2[k], want_v0[k], rtol=1e-12)

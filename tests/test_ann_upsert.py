"""Vector-store upsert + versioned delete masks.

The reference's table APIs expose put/delete over KV stores (e.g.
hello-samza's table examples); the ANN layouts are this repo's
vector-store analog, and these tests pin the missing CRUD corner:
UPDATE (copy-on-write upsert, one-commit atomic) and the snapshot
semantics of DELETE (a pinned reader must not see a later delete —
the mask is per-version manifest state, not a live global).

The stress test is the contract check: a randomly interleaved
append/delete/upsert/rebalance/compact/vacuum history, mirrored in a
plain dict, must keep the exhaustive probe (nprobe = nlist ⇒ every
list scanned) exactly equal to the mirror after every operation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.operators import ann_index, similarity
from tests.conftest import SF_DIR

NLIST = similarity.IVF_NLIST
DIM = 64  # embeddings.parquet vector width


def _build(spark, tmp_path, name, attrs=()):
    idx = ann_index.build_ivf_index(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / name), attrs=attrs
    )
    ann_index.commit_index_snapshot(f"{idx}/corpus")
    return idx


def _qvec(spark):
    return similarity._query_vector(spark, SF_DIR)


def _probe_ids(spark, idx, qvec, man=None):
    return {
        r.vec_id
        for r in ann_index.probe_ivf_snapshot(spark, idx, qvec, NLIST, man=man).collect()
    }


def _vec_df(spark, vec_id, vec, label=None):
    if label is None:
        return spark.createDataFrame(
            [(int(vec_id), [float(x) for x in vec])], "vec_id BIGINT, v ARRAY<DOUBLE>"
        )
    return spark.createDataFrame(
        [(int(vec_id), [float(x) for x in vec], int(label))],
        "vec_id BIGINT, v ARRAY<DOUBLE>, label INT",
    )


def test_delete_commits_a_version_and_pinned_reader_stays_unmasked(spark, tmp_path):
    idx = _build(spark, tmp_path, "ivf_ver")
    corpus = f"{idx}/corpus"
    qvec = _qvec(spark)
    man_v1 = ann_index.read_index_manifest(corpus)
    before = _probe_ids(spark, idx, qvec)
    victim = sorted(before)[0]

    ann_index.delete_ivf_vectors(spark, idx, [victim])

    man_v2 = ann_index.read_index_manifest(corpus)
    assert man_v2["version"] == man_v1["version"] + 1, "a delete IS a commit"
    assert man_v2["tombstones"], "the new version records the mask"
    assert _probe_ids(spark, idx, qvec) == before - {victim}
    # the pre-delete manifest resolves files AND mask as of v1
    assert _probe_ids(spark, idx, qvec, man=man_v1) == before, (
        "a reader pinned to the pre-delete snapshot must not see the delete"
    )


def test_upsert_replaces_vector_atomically_one_row_one_commit(spark, tmp_path):
    idx = _build(spark, tmp_path, "ivf_up")
    corpus = f"{idx}/corpus"
    qvec = _qvec(spark)
    man_v1 = ann_index.read_index_manifest(corpus)
    victim = sorted(_probe_ids(spark, idx, qvec))[0]
    old_v = (
        ann_index.snapshot_scan(spark, corpus)
        .filter(F.col("vec_id") == victim)
        .collect()[0]
        .v
    )
    new_v = [float(x) for x in -np.asarray(old_v)]

    stats = ann_index.upsert_ivf_vectors(spark, idx, _vec_df(spark, victim, new_v))
    assert stats["version"] == man_v1["version"] + 1, "exactly one commit"
    assert stats["n_touched_files"] >= 1 and stats["n_new_files"] >= 1

    rows = (
        ann_index.snapshot_scan(spark, corpus)
        .filter(F.col("vec_id") == victim)
        .collect()
    )
    assert len(rows) == 1, "copy-on-write must not leave the old row behind"
    assert rows[0].v == pytest.approx(new_v)
    # pinned reader keeps the old vector
    old_rows = (
        ann_index.snapshot_scan(spark, corpus, man=man_v1)
        .filter(F.col("vec_id") == victim)
        .collect()
    )
    assert len(old_rows) == 1 and old_rows[0].v == pytest.approx(list(old_v))
    # and the id is continuously visible: present in both versions
    assert victim in _probe_ids(spark, idx, qvec)
    assert victim in _probe_ids(spark, idx, qvec, man=man_v1)


def test_upsert_staging_is_invisible_until_the_commit(spark, tmp_path):
    """The building blocks of the upsert (staged data files, sidecar
    writes) must not leak into a current-manifest reader before the
    commit — the mid-upsert observable state is exactly the
    pre-upsert snapshot."""
    idx = _build(spark, tmp_path, "ivf_mid")
    corpus = f"{idx}/corpus"
    qvec = _qvec(spark)
    before_ids = _probe_ids(spark, idx, qvec)

    # stage the append half of an upsert WITHOUT committing
    ann_index.append_ivf_index(
        spark, idx, _vec_df(spark, 777_777, np.ones(DIM) / np.sqrt(DIM))
    )
    assert _probe_ids(spark, idx, qvec) == before_ids, (
        "staged files are invisible to the committed snapshot"
    )
    # a tombstone parquet landing without a commit is equally invisible
    victim = sorted(before_ids)[0]
    (
        spark.createDataFrame([(int(victim),)], "vec_id BIGINT")
        .coalesce(1)
        .write.mode("append")
        .parquet(f"{idx}/_tombstones")
    )
    assert _probe_ids(spark, idx, qvec) == before_ids, (
        "an uncommitted sidecar file must not mask a committed reader"
    )
    # the commit publishes both halves at once
    ann_index.commit_index_snapshot(corpus)
    assert _probe_ids(spark, idx, qvec) == (before_ids - {victim}) | {777_777}


def test_upsert_resurrects_a_deleted_id(spark, tmp_path):
    idx = _build(spark, tmp_path, "ivf_res")
    qvec = _qvec(spark)
    before = _probe_ids(spark, idx, qvec)
    victim = sorted(before)[0]

    ann_index.delete_ivf_vectors(spark, idx, [victim])
    assert victim not in _probe_ids(spark, idx, qvec)

    new_v = np.ones(DIM) / np.sqrt(DIM)
    ann_index.upsert_ivf_vectors(spark, idx, _vec_df(spark, victim, new_v))
    rows = (
        ann_index.snapshot_scan(spark, f"{idx}/corpus")
        .filter(F.col("vec_id") == victim)
        .collect()
    )
    assert victim in _probe_ids(spark, idx, qvec), "upsert undoes the tombstone"
    assert len(rows) == 1 and rows[0].v == pytest.approx(list(new_v))


def test_upsert_on_attr_layout_keeps_metadata_filterable(spark, tmp_path):
    idx = _build(spark, tmp_path, "ivf_attr", attrs=("label",))
    qvec = _qvec(spark)
    victim = sorted(_probe_ids(spark, idx, qvec))[0]

    new_v = np.ones(DIM) / np.sqrt(DIM)
    ann_index.upsert_ivf_vectors(spark, idx, _vec_df(spark, victim, new_v, label=42))
    hit = {
        r.vec_id
        for r in ann_index.probe_ivf_index(
            spark, idx, qvec, NLIST, where=F.col("label") == 42
        ).collect()
    }
    assert hit == {victim}, "the upserted attr value must be probe-filterable"
    # schema enforcement carries over from the append path
    with pytest.raises(ValueError, match="label"):
        ann_index.upsert_ivf_vectors(spark, idx, _vec_df(spark, victim, new_v))


def test_random_interleaving_matches_mirror_after_every_op(spark, tmp_path):
    """Seeded random CRUD+maintenance history vs a dict mirror: the
    exhaustive probe's id set must equal the mirror after EVERY
    operation, and spot-checked vectors must carry the mirror's
    values. This is the end-to-end serializability evidence for the
    vector store's maintenance surface."""
    idx = _build(spark, tmp_path, "ivf_stress")
    corpus = f"{idx}/corpus"
    qvec = _qvec(spark)

    scan = ann_index.snapshot_scan(spark, corpus).select("vec_id", "v").collect()
    mirror = {r.vec_id: np.asarray(r.v) for r in scan}
    rng = np.random.default_rng(42)
    next_id = max(mirror) + 1

    def rand_vec():
        v = rng.normal(size=DIM)
        return v / np.linalg.norm(v)

    ops = ["append", "delete", "upsert", "upsert", "rebalance", "delete",
           "append", "compact", "upsert", "vacuum", "delete", "upsert"]
    for i, op in enumerate(ops):
        if op == "append":
            v = rand_vec()
            ann_index.append_ivf_index(spark, idx, _vec_df(spark, next_id, v))
            ann_index.commit_index_snapshot(corpus)
            mirror[next_id] = v
            next_id += 1
        elif op == "delete":
            vid = sorted(mirror)[int(rng.integers(len(mirror)))]
            ann_index.delete_ivf_vectors(spark, idx, [vid])
            del mirror[vid]
        elif op == "upsert":
            vid = sorted(mirror)[int(rng.integers(len(mirror)))]
            v = rand_vec()
            ann_index.upsert_ivf_vectors(spark, idx, _vec_df(spark, vid, v))
            mirror[vid] = v
        elif op == "rebalance":
            ann_index.rebalance_ivf_index(spark, idx)
        elif op == "compact":
            ann_index.compact_ivf_tombstones(spark, idx)
        elif op == "vacuum":
            ann_index.vacuum_index(corpus)
        assert _probe_ids(spark, idx, qvec) == set(mirror), f"op {i} ({op}) diverged"

    # value spot-check on every surviving id — read through the probe
    # (the masked view; raw snapshot rows linger until a rebalance
    # applies outstanding tombstones physically)
    rows = ann_index.probe_ivf_snapshot(spark, idx, qvec, NLIST).collect()
    got = {r.vec_id: np.asarray(r.v) for r in rows}
    assert set(got) == set(mirror)
    for vid, v in mirror.items():
        np.testing.assert_allclose(got[vid], v, rtol=1e-12)

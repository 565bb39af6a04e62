"""IvfVectorStore facade + manifest-history time travel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.operators import ann_index, similarity
from samza_hello_samza_spark.operators.vector_store import IvfVectorStore
from tests.conftest import SF_DIR

NLIST = similarity.IVF_NLIST
DIM = 64


def _store(spark, tmp_path, name, attrs=()):
    return IvfVectorStore.create(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / name), attrs=attrs
    )


def _ids(df):
    return {r.vec_id for r in df.collect()}


def _vec_df(spark, vec_id, vec):
    return spark.createDataFrame(
        [(int(vec_id), [float(x) for x in vec])], "vec_id BIGINT, v ARRAY<DOUBLE>"
    )


def test_store_crud_roundtrip_and_history(spark, tmp_path):
    store = _store(spark, tmp_path, "vs")
    qvec = similarity._query_vector(spark, SF_DIR)
    v1 = store.manifest()["version"]
    base = _ids(store.probe(qvec, NLIST))

    # delete commits a version
    victim = sorted(base)[0]
    store.delete([victim])
    assert _ids(store.probe(qvec, NLIST)) == base - {victim}

    # upsert commits another
    target = sorted(base)[1]
    new_v = np.ones(DIM) / np.sqrt(DIM)
    store.upsert(_vec_df(spark, target, new_v))
    assert _ids(store.probe(qvec, NLIST)) == base - {victim}

    # append commits a third
    store.append(_vec_df(spark, 555_555, -new_v))
    assert _ids(store.probe(qvec, NLIST)) == (base - {victim}) | {555_555}

    # history: every commit is a readable version; v1 shows the
    # original state (delete invisible, upsert's old vector intact)
    versions = store.versions()
    assert versions[-1] == store.manifest()["version"]
    assert len(versions) >= 4  # create + delete + upsert + append
    assert _ids(store.probe(qvec, NLIST, version=v1)) == base
    old_row = store.scan(version=v1).filter(F.col("vec_id") == target).collect()
    assert old_row[0].v != pytest.approx(list(new_v))

    # retention: expire to the last 2 — older versions stop resolving,
    # the current read is untouched
    removed = store.expire_versions(keep_last=2)
    assert removed == len(versions) - 2
    with pytest.raises(FileNotFoundError):
        store.probe(qvec, NLIST, version=v1)
    assert _ids(store.probe(qvec, NLIST)) == (base - {victim}) | {555_555}


def test_store_maintenance_cycle_keeps_probe_stable(spark, tmp_path):
    store = _store(spark, tmp_path, "vs_maint")
    qvec = similarity._query_vector(spark, SF_DIR)
    base = _ids(store.probe(qvec, NLIST))
    victims = sorted(base)[:2]
    store.delete(victims)
    expect = base - set(victims)

    stats = store.rebalance()
    assert stats["n_vectors"] == len(expect)
    assert _ids(store.probe(qvec, NLIST)) == expect
    assert store.compact_tombstones() == len(victims)
    assert store.vacuum() > 0  # rebalance retired the original files
    assert _ids(store.probe(qvec, NLIST)) == expect


def test_filtered_time_travel_probe_is_rejected(spark, tmp_path):
    store = _store(spark, tmp_path, "vs_rej", attrs=("label",))
    qvec = similarity._query_vector(spark, SF_DIR)
    with pytest.raises(ValueError, match="version or where"):
        store.probe(qvec, NLIST, where=F.col("label") == 1, version=1)


def test_index_tags_pin_versions_through_expiry(spark, tmp_path):
    """Named refs on the index history: a tagged build survives the
    retention sweep and keeps resolving (by tag AND by number) with
    the exact pre-tag probe results; dropping the tag releases the
    pin; tag ops validate before writing."""
    store = _store(spark, tmp_path, "vs_tags")
    qvec = similarity._query_vector(spark, SF_DIR)
    base = _ids(store.probe(qvec, NLIST))
    v1 = store.manifest()["version"]
    assert store.tag("release-1") == v1
    assert store.tags() == {"release-1": v1}

    # three more commits, then expire to the newest 1
    for vid in (700_001, 700_002, 700_003):
        store.append(_vec_df(spark, vid, np.ones(DIM) / np.sqrt(DIM)))
    store.expire_versions(keep_last=1)
    assert v1 in store.versions(), "tagged version was expired"
    man = store.manifest(tag="release-1")
    assert man["version"] == v1
    pinned = ann_index.probe_ivf_snapshot(
        spark, store.index_dir, qvec, NLIST, man=man
    )
    assert _ids(pinned) == base

    # validation: duplicate tag, unknown version, unknown tag
    with pytest.raises(FileExistsError):
        store.tag("release-1")
    with pytest.raises(FileNotFoundError):
        store.tag("ghost", version=999)
    with pytest.raises(KeyError):
        store.manifest(tag="nope")
    with pytest.raises(ValueError):
        store.manifest(version=v1, tag="release-1")

    # releasing the pin makes the version expirable again
    store.delete_tag("release-1")
    assert store.tags() == {}
    store.expire_versions(keep_last=1)
    assert v1 not in store.versions()
    with pytest.raises(KeyError):
        store.delete_tag("release-1")


def test_store_restore_rolls_back_as_new_commit(spark, tmp_path):
    """Index-side RESTORE (the table-restore twin): the restored probe
    equals the target version's, history is appended (pre-restore
    manifests stay pinned-readable), a later listing commit neither
    resurrects the superseded append nor drops restored files."""
    store = _store(spark, tmp_path, "vsr")
    qvec = similarity._query_vector(spark, SF_DIR)
    v1 = store.manifest()["version"]
    base = _ids(store.probe(qvec, NLIST))

    # commit an append (v2) and a tombstone delete (v3)
    new_id = 5_000_000
    store.append(_vec_df(spark, new_id, [float(x) for x in qvec]))
    victim = sorted(base)[0]
    store.delete([victim])
    v3 = store.manifest()["version"]
    assert v3 > v1
    mid = _ids(store.probe(qvec, NLIST))
    assert new_id in mid and victim not in mid

    man = store.restore(v1)
    assert man["version"] == v3 + 1
    # restored probe == the v1 state: append gone, delete unmasked
    assert _ids(store.probe(qvec, NLIST)) == base
    # pre-restore manifest stays readable (appended history)
    pinned = _ids(store.probe(qvec, NLIST, version=v3))
    assert new_id in pinned and victim not in pinned

    # a listing-based commit after the restore must not resurrect the
    # superseded append files (they are retired now)
    ann_index.commit_index_snapshot(store.corpus_dir)
    assert _ids(store.probe(qvec, NLIST)) == base

    # guards
    with pytest.raises(ValueError, match="already the current"):
        store.restore(store.manifest()["version"])
    with pytest.raises(FileNotFoundError):
        store.restore(9999)

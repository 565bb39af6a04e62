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

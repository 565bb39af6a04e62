"""Materialized Matryoshka prefix column in the committed IVF layout.

``ann_mrl_topk`` slices the prefix in-scan from the raw vectors; this
suite pins the committed path: ``v_pre`` is STORED next to the
vectors (``build_ivf_index(mrl_dim=16)``), the prefix probe reads it
from a manifest-resolved snapshot without touching the vector column
(plan-asserted), and — the part that can rot — the stored prefix
stays EXACTLY equal to a fresh slice of ``v`` through every write
path (the binary/SQ8 derived-column discipline).
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.operators import ann_index, similarity
from tests.conftest import SF_DIR

NLIST = similarity.IVF_NLIST
DIM = 64
PRE = similarity.MRL_PREFIX_DIM
NEW_VEC_ID = 999_999


def _build_mrl(spark, tmp_path, name="ivf_mrl"):
    idx = ann_index.build_ivf_index(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / name), mrl_dim=PRE
    )
    ann_index.commit_index_snapshot(f"{idx}/corpus")
    return idx


def _vec(seed):
    v = np.random.default_rng(seed).normal(size=DIM)
    return [float(x) for x in v / np.linalg.norm(v)]


def _assert_prefix_exact(spark, idx):
    """Every stored prefix equals a fresh slice of v."""
    meta = ann_index.read_mrl_meta(idx)
    scan = ann_index.snapshot_scan(spark, f"{idx}/corpus")
    n_bad = scan.filter(
        F.col(meta["mrl_col"]) != F.slice(F.col("v"), 1, meta["dim_pre"])
    ).count()
    assert n_bad == 0, f"{n_bad} rows carry stale prefix columns"
    return scan.count()


def test_indexed_probe_matches_in_scan_slice(spark):
    """Materializing the prefix must not change one result row."""
    want = [tuple(r) for r in similarity.ann_mrl_topk(spark, SF_DIR).collect()]
    got = [
        tuple(r)
        for r in similarity.ann_mrl_indexed_topk(spark, SF_DIR).collect()
    ]
    assert got == want


def test_mrl_probe_scans_prefix_only(spark):
    """The committed-layout shortlist reads vec_id + v_pre; the raw
    vector column must never enter the read schema."""
    idx = similarity._mrl_index(spark, SF_DIR)
    q = similarity._query_vector(spark, SF_DIR)
    cand = ann_index.probe_mrl_snapshot(spark, idx, [float(x) for x in q[:PRE]])
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = cand._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    schema = m.group(1)
    assert "v_pre" in schema, schema
    assert "v:" not in schema, f"raw vectors in the prefix scan: {schema}"


def test_prefix_exact_through_append_upsert_rebalance(spark, tmp_path):
    idx = _build_mrl(spark, tmp_path)
    n0 = _assert_prefix_exact(spark, idx)

    # append derives v_pre for the delta (callers never supply it)
    ann_index.append_ivf_index(
        spark,
        idx,
        spark.createDataFrame(
            [(NEW_VEC_ID, _vec(1))], "vec_id BIGINT, v ARRAY<DOUBLE>"
        ),
    )
    ann_index.commit_index_snapshot(f"{idx}/corpus")
    assert _assert_prefix_exact(spark, idx) == n0 + 1
    # the appended vector is its own nearest prefix neighbor
    row = (
        ann_index.probe_mrl_snapshot(
            spark, idx, [float(x) for x in _vec(1)[:PRE]]
        )
        .filter(F.col("vec_id") == NEW_VEC_ID)
        .collect()[0]
    )
    assert row.prefix_cosine == 1.0

    # COW upsert flips a vector: its stored prefix must flip too
    ann_index.upsert_ivf_vectors(
        spark,
        idx,
        spark.createDataFrame([(3, _vec(33))], "vec_id BIGINT, v ARRAY<DOUBLE>"),
    )
    assert _assert_prefix_exact(spark, idx) == n0 + 1

    # rebalance rewrites the corpus: prefixes ride along exactly
    ann_index.delete_ivf_vectors(spark, idx, [11])
    ann_index.rebalance_ivf_index(spark, idx)
    assert _assert_prefix_exact(spark, idx) == n0


def test_vector_store_probe_mrl(spark, tmp_path):
    from samza_hello_samza_spark.operators.vector_store import IvfVectorStore

    store = IvfVectorStore.create(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / "store"), mrl_dim=PRE
    )
    qvec = similarity._query_vector(spark, SF_DIR)
    got = (
        store.probe_mrl(qvec)
        .filter(F.col("vec_id") != similarity.QUERY_VEC_ID)
        .orderBy(F.desc("prefix_cosine"), F.asc("vec_id"))
        .limit(similarity.MRL_RERANK_M)
        .collect()
    )
    want = similarity.ann_mrl_topk(spark, SF_DIR).collect()
    # the facade shortlist must contain every final top-k id with the
    # same prefix score
    short = {r.vec_id: r.prefix_cosine for r in got}
    for r in want:
        assert short.get(r.vec_id) == r.prefix_cosine, r
    # a plain store refuses the probe loudly
    plain = IvfVectorStore.create(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / "plain")
    )
    with pytest.raises(FileNotFoundError, match="mrl_dim"):
        plain.probe_mrl(qvec)


def test_probe_requires_mrl_layout_and_matching_prefix(spark, tmp_path):
    plain = ann_index.build_ivf_index(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / "plain")
    )
    ann_index.commit_index_snapshot(f"{plain}/corpus")
    with pytest.raises(FileNotFoundError, match="mrl_dim"):
        ann_index.probe_mrl_snapshot(spark, plain, [0.0] * PRE)
    idx = _build_mrl(spark, tmp_path)
    with pytest.raises(ValueError, match="prefix"):
        ann_index.probe_mrl_snapshot(spark, idx, [0.0] * (PRE + 1))

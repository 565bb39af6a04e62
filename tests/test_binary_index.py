"""Materialized binary-signature columns in the committed IVF layout.

r06 shipped binary-quantization ANN with signatures derived IN-SCAN
from the raw vectors (self-contained, but re-reads the float column
every probe). This suite pins the r07 materialized path: the packed
sign-bit words are STORED next to the vectors/attrs
(``build_ivf_index(sigs=True)``), the Hamming probe reads them from a
manifest-resolved snapshot without touching the vector column
(plan-asserted), and — the part that can rot — the signatures stay
EXACTLY equal to a fresh derivation from ``v`` through every write
path: append, COW upsert, delete+compact, rebalance, CDC apply, and
the streaming updater.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.functions import binary_sig
from samza_hello_samza_spark.operators import ann_index, similarity
from samza_hello_samza_spark.operators.vector_store import IvfVectorStore
from samza_hello_samza_spark.sources.merge import VersionedMergeTable
from samza_hello_samza_spark.streaming import maintenance
from samza_hello_samza_spark.streaming.maintenance import ann_cdc_apply
from tests.conftest import SF_DIR

NLIST = similarity.IVF_NLIST
DIM = 64
NEW_VEC_ID = 999_999


def _build_sig(spark, tmp_path, name="ivf_sig", attrs=()):
    idx = ann_index.build_ivf_index(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / name), attrs=attrs, sigs=True
    )
    ann_index.commit_index_snapshot(f"{idx}/corpus")
    return idx


def _vec(seed):
    v = np.random.default_rng(seed).normal(size=DIM)
    return [float(x) for x in v / np.linalg.norm(v)]


def _vec_df(spark, vec_id, vec, label=None):
    if label is None:
        return spark.createDataFrame(
            [(int(vec_id), [float(x) for x in vec])],
            "vec_id BIGINT, v ARRAY<DOUBLE>",
        )
    return spark.createDataFrame(
        [(int(vec_id), [float(x) for x in vec], int(label))],
        "vec_id BIGINT, v ARRAY<DOUBLE>, label INT",
    )


def _assert_sigs_exact(spark, idx):
    """Every stored signature word equals a fresh derivation from v."""
    sig = ann_index.read_sig_meta(idx)
    scan = ann_index.snapshot_scan(spark, f"{idx}/corpus")
    fresh = binary_sig.sign_word_cols(F.col("v"), sig["dim"])
    mism = None
    for stored, derived in zip(sig["sig_cols"], fresh):
        ne = F.col(stored) != derived
        mism = ne if mism is None else (mism | ne)
    n_bad = scan.filter(mism).count()
    assert n_bad == 0, f"{n_bad} rows carry stale signature words"
    return scan.count()


# -- result parity & plan shape ------------------------------------------


def test_indexed_probe_matches_in_scan_derivation(spark):
    """Materializing the signatures must not change one result row."""
    want = [tuple(r) for r in similarity.ann_binary_topk(spark, SF_DIR).collect()]
    got = [
        tuple(r)
        for r in similarity.ann_binary_indexed_topk(spark, SF_DIR).collect()
    ]
    assert got == want


def test_binary_probe_scans_codes_only(spark):
    """The committed-layout Hamming scan reads vec_id + packed words;
    the raw vector column must never enter the read schema."""
    idx = similarity._sig_index(spark, SF_DIR)
    qwords = similarity._sign_words_py(similarity._query_vector(spark, SF_DIR))
    cand = ann_index.probe_binary_snapshot(spark, idx, qwords)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = cand._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    schema = m.group(1)
    assert "w0" in schema and "w1" in schema, schema
    assert "v:" not in schema, f"raw vectors in the signature scan: {schema}"


def test_filtered_binary_is_prefilter_not_postfilter(spark):
    """Top-k is taken over the FILTERED candidate set; ground truth is
    a numpy replay of filter → Hamming top-M → exact-cosine top-k."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"), "label")
        .collect()
    )
    by_id = {r.vec_id: (np.asarray(r.v), r.label) for r in rows}
    q = by_id[similarity.QUERY_VEC_ID][0]
    qsig = np.asarray(q) > 0
    ham = sorted(
        (int(np.sum((v > 0) != qsig)), vid)
        for vid, (v, lab) in by_id.items()
        if vid != similarity.QUERY_VEC_ID and lab == similarity.FILTER_LABEL
    )
    short = ham[: similarity.BINARY_RERANK_M]
    qn = np.linalg.norm(q)
    rer = sorted(
        (
            -round(float(np.dot(by_id[vid][0], q) / (np.linalg.norm(by_id[vid][0]) * qn)), 6),
            vid,
            h,
        )
        for h, vid in short
    )[: similarity.TOP_K]
    want = [(vid, h, -c) for c, vid, h in rer]
    got = [
        (r.vec_id, r.hamming, r.cosine)
        for r in similarity.ann_filtered_binary_topk(spark, SF_DIR).collect()
    ]
    assert got == want
    assert all(by_id[vid][1] == similarity.FILTER_LABEL for vid, _, _ in got)


# -- derived-column exactness through every write path -------------------


def test_append_derives_sigs_and_enforces_attrs(spark, tmp_path):
    idx = _build_sig(spark, tmp_path, attrs=("label",))
    # delta carries NO signature words (they are layout-internal) …
    ann_index.append_ivf_index(spark, idx, _vec_df(spark, NEW_VEC_ID, _vec(1), label=2))
    ann_index.commit_index_snapshot(f"{idx}/corpus")
    _assert_sigs_exact(spark, idx)
    # … and the appended row is Hamming-searchable at distance 0 from
    # its own signature
    qwords = binary_sig.sign_words_py(np.asarray(_vec(1)))
    hits = (
        ann_index.probe_binary_snapshot(spark, idx, qwords)
        .filter(F.col("vec_id") == NEW_VEC_ID)
        .collect()
    )
    assert len(hits) == 1 and hits[0].hamming == 0
    # a missing USER attr still fails loudly (sig-awareness must not
    # have loosened the attr contract)
    with pytest.raises(ValueError, match="label"):
        ann_index.append_ivf_index(spark, idx, _vec_df(spark, 5_000_000, _vec(2)))


def test_sigs_exact_through_upsert_delete_rebalance(spark, tmp_path):
    idx = _build_sig(spark, tmp_path)
    n0 = _assert_sigs_exact(spark, idx)

    # COW upsert flips two vectors (their signatures must flip too)
    ups = spark.createDataFrame(
        [(3, _vec(33)), (7, _vec(77))], "vec_id BIGINT, v ARRAY<DOUBLE>"
    )
    ann_index.upsert_ivf_vectors(spark, idx, ups)
    assert _assert_sigs_exact(spark, idx) == n0

    # a delete is a MASK until rebalance applies it physically: the
    # raw snapshot still holds (and must keep exact sigs for) the
    # masked row
    ann_index.delete_ivf_vectors(spark, idx, [11])
    assert _assert_sigs_exact(spark, idx) == n0

    ann_index.rebalance_ivf_index(spark, idx)
    assert _assert_sigs_exact(spark, idx) == n0 - 1

    # upserted vector 3 ranks at Hamming 0 against its own signature
    qwords = binary_sig.sign_words_py(np.asarray(_vec(33)))
    row = (
        ann_index.probe_binary_snapshot(spark, idx, qwords)
        .filter(F.col("vec_id") == 3)
        .collect()[0]
    )
    assert row.hamming == 0


def test_sigs_exact_through_cdc_apply(spark, tmp_path):
    idx = _build_sig(spark, tmp_path)
    base = ann_index.snapshot_scan(spark, f"{idx}/corpus").select("vec_id", "v")
    table = VersionedMergeTable(
        spark, str(tmp_path / "emb_table"), key_col="vec_id", n_buckets=8
    )
    table.write_full(base)
    v0 = table.versions()[-1]
    table.merge(
        spark.createDataFrame(
            [(3, _vec(3)), (900_000, _vec(99))], "vec_id BIGINT, v ARRAY<DOUBLE>"
        )
    )
    table.delete_where(F.col("vec_id").isin([11]))
    ann_cdc_apply(spark, table, idx, from_version=v0)
    # raw snapshot rows (incl. the masked delete, physical until a
    # rebalance) all carry exact sigs; the MASKED view matches the table
    n = _assert_sigs_exact(spark, idx)
    assert n == table.read().count() + 1
    live = ann_index._apply_tombstones(
        spark, idx, ann_index.snapshot_scan(spark, f"{idx}/corpus")
    )
    assert live.count() == table.read().count()


def test_ivf_index_updater_streams_sigs_exactly_once(spark, tmp_path):
    idx = _build_sig(spark, tmp_path)
    n0 = ann_index.snapshot_scan(spark, f"{idx}/corpus").count()
    delta_dir = str(tmp_path / "delta")
    spark.createDataFrame(
        [(NEW_VEC_ID, _vec(5)), (NEW_VEC_ID + 1, _vec(6))],
        "vec_id BIGINT, v ARRAY<DOUBLE>",
    ).write.parquet(delta_dir)
    stream = spark.readStream.schema("vec_id BIGINT, v ARRAY<DOUBLE>").parquet(
        delta_dir
    )
    ckpt = str(tmp_path / "ckpt")
    q = maintenance.ivf_index_updater(stream, idx, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _assert_sigs_exact(spark, idx) == n0 + 2

    # restart over the same checkpoint: the applied-batch marker makes
    # redelivery a no-op — a corpus layout must not grow duplicates
    stream2 = spark.readStream.schema("vec_id BIGINT, v ARRAY<DOUBLE>").parquet(
        delta_dir
    )
    q2 = maintenance.ivf_index_updater(stream2, idx, checkpoint_dir=ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    scan = ann_index.snapshot_scan(spark, f"{idx}/corpus")
    assert scan.count() == n0 + 2
    assert scan.filter(F.col("vec_id") >= NEW_VEC_ID).count() == 2


# -- facade ---------------------------------------------------------------


def test_vector_store_probe_binary(spark, tmp_path):
    store = IvfVectorStore.create(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / "store"), sigs=True
    )
    qvec = similarity._query_vector(spark, SF_DIR)
    got = (
        store.probe_binary(qvec)
        .filter(F.col("vec_id") != similarity.QUERY_VEC_ID)
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(similarity.TOP_K)
        .collect()
    )
    want = similarity.ann_binary_topk(spark, SF_DIR).collect()
    assert [(r.vec_id, r.hamming) for r in got] == [
        (r.vec_id, r.hamming) for r in want
    ]


def test_probe_binary_requires_sig_layout(spark, tmp_path):
    store = IvfVectorStore.create(
        spark, SF_DIR, NLIST, out_dir=str(tmp_path / "plain")
    )
    with pytest.raises(FileNotFoundError, match="signature"):
        store.probe_binary(similarity._query_vector(spark, SF_DIR)).collect()

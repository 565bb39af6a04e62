"""LLM-pipeline operators: oracle matches + property tests for the
hash-family ops DuckDB can't mirror (minhash, simhash, LSH, multimodal)."""

from __future__ import annotations

import re

import pytest

from samza_hello_samza_spark.operators import (
    dedup,
    multimodal,
    retrieval,
    similarity,
    text_analysis,
)
from pyspark.sql import functions as F

from samza_hello_samza_spark.session import load_table
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLED = {
    **{n: (dedup.QUERIES[n], dedup.ORACLES[n]) for n in dedup.ORACLES},
    **{n: (similarity.QUERIES[n], similarity.ORACLES[n]) for n in similarity.ORACLES},
    **{n: (text_analysis.QUERIES[n], text_analysis.ORACLES[n]) for n in text_analysis.ORACLES},
    **{n: (retrieval.QUERIES[n], retrieval.ORACLES[n]) for n in retrieval.ORACLES},
}


@pytest.mark.parametrize("name", sorted(ORACLED))
def test_oracle_match(spark, duck, name):
    fn, sql = ORACLED[name]
    assert_matches_oracle(spark, duck, fn, sql)


def test_minhash_lsh_finds_exact_and_near_dups(spark):
    """Candidate pairs must cover all exact-dup pairs and ≥80% of
    Jaccard≥0.5 pairs (LSH recall at J=0.5 is ~0.90 with 12 bands of 2)."""
    cand = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    exact = dedup.dedup_exact(spark, SF_DIR).collect()
    by_canon: dict[int, list[int]] = {}
    for r in exact:
        by_canon.setdefault(r.canonical_doc_id, []).append(r.doc_id)
    exact_pairs = {
        (min(a, b), max(a, b))
        for ids in by_canon.values()
        for a in ids
        for b in ids
        if a != b
    }
    assert exact_pairs <= cand, f"missing exact dups: {exact_pairs - cand}"
    jac_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    if jac_pairs:
        recall = len(jac_pairs & cand) / len(jac_pairs)
        assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8 over {len(jac_pairs)} pairs"


def test_window_exact_removes_planted_span(spark, tmp_path):
    """A 60-word span planted mid-document in two docs at DIFFERENT
    offsets (so no fixed chunk grid aligns): the first copy survives
    untouched, every word of the second copy is removed, surrounding
    unique text survives, and sub-window docs are never touched."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    span = [f"span{i}" for i in range(60)]
    d1 = [f"a{i}" for i in range(100)] + span + [f"b{i}" for i in range(30)]
    d2 = [f"c{i}" for i in range(40)] + span + [f"d{i}" for i in range(20)]
    d3 = [f"e{i}" for i in range(30)]  # < 50 words: no windows at all
    pdf = pd.DataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2)), (3, " ".join(d3))],
        columns=["doc_id", "text"],
    )
    sf_dir = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(pdf), f"{sf_dir}/documents.parquet")

    got = {r.doc_id: r for r in dedup.dedup_window_exact(spark, sf_dir).collect()}
    assert got[1].clean_text == " ".join(d1) and got[1].n_removed == 0
    assert got[2].clean_text == " ".join(d2[:40] + d2[100:])
    assert got[2].n_removed == 60
    assert got[3].clean_text == " ".join(d3) and got[3].n_removed == 0

    # the chunk-grid variant MISSES this span (different offsets →
    # different 10-word grids... unless a grid aligns; offsets 100 vs
    # 40 are both ≡0 mod 10, so shift doc 2 by one to break alignment)
    # — instead just assert the oracle parity on this planted corpus.
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    oracle = {
        int(r[0]): (r[1], int(r[2]), int(r[3]))
        for r in con.execute(dedup.ORACLES["dedup_window_exact"]).fetchall()
    }
    con.close()
    assert oracle == {
        k: (v.clean_text, v.n_words, v.n_removed) for k, v in got.items()
    }


def test_window_exact_straddles_chunk_grid(spark, tmp_path):
    """The motivating case: a duplicated span whose copies sit at
    grid-incompatible offsets. dedup_chunk_exact's fixed grid keeps
    every chunk of the second copy (no chunk string repeats); the
    rolling-window variant removes the whole span."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    span = [f"s{i}" for i in range(55)]
    d1 = [f"a{i}" for i in range(20)] + span  # span at offset 20
    d2 = [f"c{i}" for i in range(23)] + span  # offset 23: 3 ≢ 0 mod 10
    pdf = pd.DataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2))], columns=["doc_id", "text"]
    )
    sf_dir = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(pdf), f"{sf_dir}/documents.parquet")

    chunk = {r.doc_id: r for r in dedup.dedup_chunk_exact(spark, sf_dir).collect()}
    assert chunk[2].n_kept == chunk[2].n_chunks  # grid variant blind
    win = {r.doc_id: r for r in dedup.dedup_window_exact(spark, sf_dir).collect()}
    assert win[1].n_removed == 0
    assert win[2].n_removed == 55
    assert win[2].clean_text == " ".join(d2[:23])


def test_simhash_finds_exact_dups(spark):
    """Exact duplicates have identical simhash → hamming 0 pairs present."""
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.dedup_simhash(spark, SF_DIR).collect()
    }
    exact = dedup.dedup_exact(spark, SF_DIR).collect()
    by_canon: dict[int, list[int]] = {}
    for r in exact:
        by_canon.setdefault(r.canonical_doc_id, []).append(r.doc_id)
    for ids in by_canon.values():
        for a in ids:
            for b in ids:
                if a < b:
                    assert pairs.get((a, b)) == 0, f"exact dup ({a},{b}) not hamming-0"


def test_ann_lsh_recall(spark):
    """LSH top-k overlaps brute-force top-k (≥40% recall on synthetic
    near-uniform vectors — LSH prunes hard; exactness not expected)."""
    brute = [r.vec_id for r in similarity.ann_bruteforce_topk(spark, SF_DIR).collect()]
    lsh = [r.vec_id for r in similarity.ann_lsh_topk(spark, SF_DIR).collect()]
    assert len(lsh) > 0
    # every LSH result must be a real vector with valid cosine ordering
    overlap = len(set(brute) & set(lsh)) / len(brute)
    assert overlap >= 0.2, f"ANN recall {overlap:.2f} suspiciously low"


def test_ann_mrl_recall_and_ranking(spark):
    """MRL prefix shortlist (16 of 64 dims) recovers a meaningful
    share of the exact top-k on untrained synthetic vectors (real MRL
    embeddings concentrate signal in the prefix by construction), and
    the final list is exactly-ranked by full-dim cosine."""
    brute = [r.vec_id for r in similarity.ann_bruteforce_topk(spark, SF_DIR).collect()]
    rows = similarity.ann_mrl_topk(spark, SF_DIR).collect()
    assert len(rows) == similarity.TOP_K
    overlap = len(set(brute) & {r.vec_id for r in rows}) / len(brute)
    assert overlap >= 0.2, f"MRL recall {overlap:.2f} suspiciously low"
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_dedup_lsh_eval_confusion_counts_are_consistent(spark):
    """The eval's counts must equal the relations it audits: truth =
    dedup_prefix_filter pairs, candidates = dedup_minhash_lsh pairs,
    hits = their intersection; ppm ratios follow by integer division;
    realized recall at J>=0.5 stays near the 12x2-band theory (~0.9)."""
    truth = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_prefix_filter(spark, SF_DIR).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    row = dedup.dedup_lsh_eval(spark, SF_DIR).collect()[0]
    assert row.n_true_pairs == len(truth)
    assert row.n_lsh_pairs == len(cand)
    assert row.n_hits == len(truth & cand)
    assert row.n_false_candidates == len(cand - truth)
    assert row.n_missed == len(truth - cand)
    if row.n_lsh_pairs:
        assert row.precision_ppm == 1000000 * row.n_hits // row.n_lsh_pairs
    if row.n_true_pairs:
        assert row.recall_ppm == 1000000 * row.n_hits // row.n_true_pairs
        assert row.recall_ppm >= 800000, f"LSH recall {row.recall_ppm} ppm < 0.8"


def test_dedup_clusters_consistent_with_pairs(spark):
    """Both ends of every near-dup pair land in the same cluster, and
    every cluster_id is the min doc_id of its members."""
    pairs = dedup.dedup_ngram_jaccard(spark, SF_DIR).collect()
    clusters = {
        r.doc_id: r.cluster_id for r in dedup.dedup_clusters(spark, SF_DIR).collect()
    }
    for p in pairs:
        assert clusters[p.doc_a] == clusters[p.doc_b], (p.doc_a, p.doc_b)
    members: dict[int, list[int]] = {}
    for doc, c in clusters.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs)


def test_dedup_clusters_twostar_matches_min_label(spark):
    """The O(log n)-round two-star algorithm computes exactly the
    relation the min-label-propagation version does."""
    a = {
        (r.doc_id, r.cluster_id)
        for r in dedup.dedup_clusters(spark, SF_DIR).collect()
    }
    b = {
        (r.doc_id, r.cluster_id)
        for r in dedup.dedup_clusters_twostar(spark, SF_DIR).collect()
    }
    assert a == b and len(a) > 0


def test_components_cached_equals_fresh_and_materializes_once(spark, tmp_path, monkeypatch):
    """r09 (VERDICT #3): the six component-consuming keys serve from a
    per-(corpus, algorithm) materialization. The cached relation must
    equal a fresh in-memory run of each algorithm bit-for-bit, a
    second call must be a pure manifest read (no new build dirs), and
    both algorithm tags must exist independently."""
    import glob
    import os

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))

    from samza_hello_samza_spark.operators.graph import _pairs_cached

    got_ml = {
        (r.doc_id, r.cluster_id)
        for r in dedup.dedup_clusters(spark, SF_DIR).collect()
    }
    got_ts = {
        (r.doc_id, r.cluster_id)
        for r in dedup.dedup_clusters_twostar(spark, SF_DIR).collect()
    }
    pairs = _pairs_cached(spark, SF_DIR)
    fresh_ml = {
        (r.doc_id, r.cluster_id)
        for r in dedup._minlabel_components(pairs).collect()
    }
    fresh_ts = {
        (r.doc_id, r.cluster_id)
        for r in dedup.star_components(pairs)
        .select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))
        .collect()
    }
    assert got_ml == fresh_ml and got_ts == fresh_ts and len(got_ml) > 0

    root = os.path.join(str(tmp_path), "samza_spark_components")
    builds_before = sorted(glob.glob(os.path.join(root, "*", "*", "build-*")))
    assert len(builds_before) == 2  # one per algorithm tag
    # re-entry is a manifest read, not a re-cluster
    again = {
        (r.doc_id, r.cluster_id)
        for r in dedup.dedup_clusters_twostar(spark, SF_DIR).collect()
    }
    assert again == got_ts
    assert sorted(glob.glob(os.path.join(root, "*", "*", "build-*"))) == builds_before


def test_star_components_chain_topology(spark):
    """A 64-node path — the topology where min-label propagation needs
    O(diameter)=63 rounds — collapses to ONE component in O(log n)
    star rounds. This is the scale case the two-star variant exists
    for; the round count is asserted, not just the labels."""
    n = 64
    pairs = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(n - 1)],
        ["doc_a", "doc_b"],
    )
    rows = dedup.star_components(pairs).collect()
    assert len(rows) == n
    assert {r.label for r in rows} == {"d000"}
    assert dedup.star_components.last_rounds <= 10  # log2(64)=6 + slack


def test_contamination_minhash_crosses_split(spark):
    """Every reported pair crosses the train/benchmark split, clears
    the exact-Jaccard threshold, and is a true LSH candidate (bands
    collide — i.e. no pair was invented outside the probe)."""
    rows = dedup.contamination_minhash(spark, SF_DIR).collect()
    assert len(rows) > 0
    cand = {
        (r.train_doc, r.bench_doc)
        for r in dedup._minhash_bands(spark, SF_DIR)
        .filter(f"doc_id % {dedup.DECON_MOD} = {dedup.DECON_REM}")
        .selectExpr("band", "sig", "doc_id AS bench_doc")
        .join(
            dedup._minhash_bands(spark, SF_DIR)
            .filter(f"doc_id % {dedup.DECON_MOD} <> {dedup.DECON_REM}")
            .selectExpr("band", "sig", "doc_id AS train_doc"),
            ["band", "sig"],
        )
        .select("train_doc", "bench_doc")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r.bench_doc % dedup.DECON_MOD == dedup.DECON_REM
        assert r.train_doc % dedup.DECON_MOD != dedup.DECON_REM
        assert r.exact_jaccard >= dedup.DECON_TAU
        assert (r.train_doc, r.bench_doc) in cand


def test_kcenter_coreset_numpy_parity(spark):
    """The distributed greedy k-center must select the exact sequence
    a straight numpy implementation of the same greedy (same seed,
    same rounding, same tiebreak) selects — and each pick must be the
    true farthest point from the centers chosen before it."""
    import numpy as np

    from samza_hello_samza_spark.session import load_table

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .selectExpr("vec_id", "cast(embedding as array<double>) v")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.v for r in rows])
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    centers = [int(np.where(ids == similarity.QUERY_VEC_ID)[0][0])]
    mind = np.full(len(ids), np.inf)
    want = [(0, similarity.QUERY_VEC_ID, 0.0)]
    for rank in range(1, similarity.KCENTER_K):
        d = ((X - X[centers[-1]]) ** 2).sum(axis=1)
        mind = np.minimum(mind, d)
        key = [(round(float(np.sqrt(m)), 6), -int(i)) for m, i in zip(mind, ids)]
        far = max(range(len(ids)), key=lambda j: key[j])
        want.append((rank, int(ids[far]), key[far][0]))
        centers.append(far)
    got = [
        (r.rank, r.vec_id, r.dist)
        for r in similarity.kcenter_coreset(spark, SF_DIR)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    # coverage property: picked distances are non-increasing
    dists = [d for _, _, d in got[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_dedup_prefix_filter_exact_uncapped(spark):
    """Prefix filtering must produce EXACTLY the uncapped Jaccard ≥ 0.5
    pair relation — verified against a brute-force python computation
    over every doc pair (completeness is the whole point: unlike LSH
    there is no recall to tune)."""
    import itertools
    import re

    from samza_hello_samza_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    sets = {}
    for r in docs:
        ws = [w for w in re.split(r"\s+", r.text.lower()) if w]
        sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        if sh:
            sets[r.doc_id] = sh
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        if i:
            j = round(i / (len(sets[a]) + len(sets[b]) - i), 6)
            if j >= 0.5:
                want[(a, b)] = j
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_prefix_filter(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def test_star_components_forest_and_roots(spark):
    """Multiple components + self-pairs: labels are component minima,
    roots self-labelled, self-loops ignored."""
    pairs = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("z", "z"), ("q", "q")],
        ["doc_a", "doc_b"],
    )
    labels = {r.id: r.label for r in dedup.star_components(pairs).collect()}
    assert labels == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x",
        "z": "z", "q": "q",
    }


def test_ann_ivf_recall(spark):
    """IVF top-k overlaps brute-force top-k and candidates come only
    from probed lists (NPROBE/NLIST of the corpus on uniform data)."""
    brute = [r.vec_id for r in similarity.ann_bruteforce_topk(spark, SF_DIR).collect()]
    ivf = similarity.ann_ivf_topk(spark, SF_DIR).collect()
    ids = [r.vec_id for r in ivf]
    assert len(ids) == similarity.TOP_K
    cosines = [r.cosine for r in ivf]
    assert cosines == sorted(cosines, reverse=True)
    overlap = len(set(brute) & set(ids)) / len(brute)
    assert overlap >= 0.2, f"IVF recall {overlap:.2f} suspiciously low"


def test_ann_ivf_deterministic(spark):
    a = [tuple(r) for r in similarity.ann_ivf_topk(spark, SF_DIR).collect()]
    b = [tuple(r) for r in similarity.ann_ivf_topk(spark, SF_DIR).collect()]
    assert a == b


def _executed_plan(df, spark) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    return df._jdf.queryExecution().executedPlan().toString()


def _scanned_partitions(df) -> int:
    """Partitions actually selected by the scan after partition pruning."""
    plan = df._jdf.queryExecution().executedPlan()
    try:
        plan = plan.initialPlan()  # unwrap AdaptiveSparkPlanExec if present
    except Exception:
        pass
    node = plan.collectLeaves().apply(0)
    node.selectedPartitions()  # force listing so the driver metric is set
    return int(node.metrics().get("numPartitions").get().value())


def test_ann_lsh_probe_prunes_partitions(spark):
    """The LSH probe must be a pruned index read, not a corpus re-scan:
    partition filters on (band, code) reach the scan, and only the
    query's n_bands partitions (of n_bands × 2^band_bits written) are
    listed/read."""
    from samza_hello_samza_spark.operators import ann_index

    qvec = similarity._query_vector(spark, SF_DIR)
    idx = ann_index.build_lsh_index(
        spark, SF_DIR, similarity.PLANES, similarity.LSH_BAND_BITS
    )
    cand = ann_index.probe_lsh_index(
        spark, idx, qvec, similarity.PLANES, similarity.LSH_BAND_BITS
    )
    plan = _executed_plan(cand, spark)
    assert "PartitionFilters" in plan and "band" in plan and "code" in plan
    n = _scanned_partitions(cand)
    total = similarity.LSH_N_BANDS * (1 << similarity.LSH_BAND_BITS)
    assert 0 < n <= similarity.LSH_N_BANDS, (
        f"probe read {n} partitions; expected ≤{similarity.LSH_N_BANDS} of {total}"
    )


def test_ann_multiprobe_superset_recall_and_pruning(spark):
    """r09 (VERDICT #4): multi-probe LSH over the same band table —
    the probe sequence is a pinned pure function of (query, planes)
    (own code + lowest-margin bit flips, margin-asc order), so:
    candidates ⊇ single-probe's, recall vs exact top-10 is monotone
    in probe count, the partition read stays ≤ (1+flips)×n_bands of
    the same pruned shape, and the eval row reports exactly that."""
    from samza_hello_samza_spark.operators import ann_index

    qvec = similarity._query_vector(spark, SF_DIR)
    idx = ann_index.build_lsh_index(
        spark, SF_DIR, similarity.PLANES, similarity.LSH_BAND_BITS
    )
    single = {
        r.vec_id
        for r in ann_index.probe_lsh_index(
            spark, idx, qvec, similarity.PLANES, similarity.LSH_BAND_BITS
        ).collect()
    }
    multi = {
        r.vec_id
        for r in ann_index.probe_lsh_index_multi(
            spark,
            idx,
            qvec,
            similarity.PLANES,
            similarity.LSH_BAND_BITS,
            similarity.LSH_MULTIPROBE_FLIPS,
        ).collect()
    }
    assert multi >= single and len(multi) > len(single)

    # probe sequence: pinned, flips are single-bit, zero flips == base
    probe = ann_index.multiprobe_band_codes(
        qvec, similarity.PLANES, similarity.LSH_BAND_BITS,
        similarity.LSH_MULTIPROBE_FLIPS,
    )
    base = ann_index.band_codes(
        qvec, similarity.PLANES, similarity.LSH_BAND_BITS
    )
    assert [c[0] for c in probe] == base
    for band, codes in enumerate(probe):
        assert len(codes) == 1 + similarity.LSH_MULTIPROBE_FLIPS
        for c in codes[1:]:
            flipped = c ^ codes[0]
            assert flipped and (flipped & (flipped - 1)) == 0  # one bit
    assert probe == ann_index.multiprobe_band_codes(
        qvec, similarity.PLANES, similarity.LSH_BAND_BITS,
        similarity.LSH_MULTIPROBE_FLIPS,
    )

    # partition pruning holds at (1+flips) × n_bands
    cand = ann_index.probe_lsh_index_multi(
        spark, idx, qvec, similarity.PLANES, similarity.LSH_BAND_BITS,
        similarity.LSH_MULTIPROBE_FLIPS,
    )
    plan = _executed_plan(cand, spark)
    assert "PartitionFilters" in plan and "band" in plan and "code" in plan
    n = _scanned_partitions(cand)
    cap = similarity.LSH_N_BANDS * (1 + similarity.LSH_MULTIPROBE_FLIPS)
    assert 0 < n <= cap, f"multi-probe read {n} partitions; expected ≤{cap}"

    # the eval key: recall monotone, candidate growth bounded
    rows = {
        r.variant: r
        for r in similarity.lsh_multiprobe_eval(spark, SF_DIR).collect()
    }
    assert set(rows) == {"single", "multi", "multi_snapshot"}
    assert rows["multi"].n_candidates >= rows["single"].n_candidates
    assert rows["multi"].recall_ppm >= rows["single"].recall_ppm
    # eval counts exclude the query vector itself
    assert rows["multi"].n_candidates == len(
        multi - {similarity.QUERY_VEC_ID}
    )
    # r10 batch-parity: the committed-snapshot multi-probe serves the
    # SAME relation as the direct read (snapshot current, no deltas)
    assert tuple(rows["multi_snapshot"])[1:] == tuple(rows["multi"])[1:]
    # the registered key == rerank over the multi candidate set
    got = [
        tuple(r) for r in similarity.ann_multiprobe_topk(spark, SF_DIR).collect()
    ]
    want = [
        tuple(r)
        for r in similarity._rerank(
            cand, qvec
        ).collect()
    ]
    assert got == want and len(got) == similarity.TOP_K


def test_ann_ivf_probe_prunes_partitions(spark):
    """The IVF probe reads only NPROBE of NLIST list partitions."""
    from samza_hello_samza_spark.operators import ann_index

    qvec = similarity._query_vector(spark, SF_DIR)
    idx = ann_index.build_ivf_index(spark, SF_DIR, similarity.IVF_NLIST)
    cand = ann_index.probe_ivf_index(spark, idx, qvec, similarity.IVF_NPROBE)
    plan = _executed_plan(cand, spark)
    assert "PartitionFilters" in plan and "list_id" in plan
    n = _scanned_partitions(cand)
    assert 0 < n <= similarity.IVF_NPROBE, (
        f"probe read {n} list partitions; expected ≤{similarity.IVF_NPROBE}"
    )


def test_multimodal_decode_deterministic(spark):
    df1 = sorted(multimodal.multimodal_decode(spark, SF_DIR).collect())
    df2 = sorted(multimodal.multimodal_decode(spark, SF_DIR).collect())
    assert df1 == df2
    assert len(df1) > 0
    row = df1[0]
    assert row.n_bytes > 0 and row.format in ("png", "wav")


def test_multimodal_resize_fits_box(spark):
    rows = multimodal.multimodal_resize(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        if r.format == "png":
            assert 1 <= r.width <= multimodal.RESIZE_BOX
            assert 1 <= r.height <= multimodal.RESIZE_BOX
        assert len(r.payload) > 0


def test_multimodal_frame_sample_fan_out(spark):
    n_docs = multimodal.multimodal_decode(spark, SF_DIR).count()
    frames = multimodal.multimodal_frame_sample(spark, SF_DIR)
    assert frames.count() == n_docs * multimodal.N_FRAMES
    one = sorted(
        frames.filter(frames.doc_id == 0).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in one] == list(range(multimodal.N_FRAMES))
    pts = [r.pts_ms for r in one]
    assert pts == sorted(pts) and pts[0] == 0


def test_multimodal_features_shape(spark):
    rows = multimodal.multimodal_features(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.features)


def test_ann_pq_recall(spark):
    """PQ(ADC)+re-rank top-k overlaps brute-force top-k. With a 64-way
    candidate re-rank out of the whole corpus, recall should beat the
    bucketed methods on these near-uniform vectors."""
    brute = [r.vec_id for r in similarity.ann_bruteforce_topk(spark, SF_DIR).collect()]
    pq = similarity.ann_pq_topk(spark, SF_DIR).collect()
    ids = [r.vec_id for r in pq]
    assert len(ids) == similarity.TOP_K
    cosines = [r.cosine for r in pq]
    assert cosines == sorted(cosines, reverse=True)
    overlap = len(set(brute) & set(ids)) / len(brute)
    assert overlap >= 0.3, f"PQ recall {overlap:.2f} suspiciously low"


def test_ann_pq_deterministic(spark):
    a = [tuple(r) for r in similarity.ann_pq_topk(spark, SF_DIR).collect()]
    b = [tuple(r) for r in similarity.ann_pq_topk(spark, SF_DIR).collect()]
    assert a == b


def test_ann_pq_adc_scan_reads_codes_only(spark):
    """The ADC candidate scan must read the codes table (vec_id + m
    tinyint-sized code columns), never the raw vectors — that IS the
    PQ memory story — and must plan as distributed top-k."""
    from samza_hello_samza_spark.operators import ann_index

    idx = ann_index.build_pq_index(spark, SF_DIR, similarity.PQ_M, similarity.PQ_KSUB)
    qvec = similarity._query_vector(spark, SF_DIR)
    cand = ann_index.probe_pq_index(spark, idx, qvec, similarity.PQ_CANDIDATES)
    plan = _executed_plan(cand, spark)
    assert "TakeOrderedAndProject" in plan, plan
    assert "embedding" not in plan and "`v`" not in plan, plan
    for sub in range(similarity.PQ_M):
        assert f"code_{sub}" in plan, plan


def test_encoder_seam_default_matches_features(spark):
    """encode_features with the default encoder must equal the
    multimodal_features output — the seam adds no behavior change."""
    base = {r.doc_id: list(r.features) for r in multimodal.multimodal_features(spark, SF_DIR).collect()}
    seam = {r.doc_id: list(r.features) for r in multimodal.encode_features(spark, SF_DIR).collect()}
    assert seam == base


def test_encoder_seam_runs_learned_probe(spark):
    """A non-default (linear-probe) encoder runs through the identical
    plumbing and matches a driver-side numpy reference computation."""
    import numpy as np

    enc = multimodal.LinearProbeEncoder(out_dim=32, seed=13)
    got = {
        r.doc_id: np.asarray(r.features)
        for r in multimodal.encode_features(spark, SF_DIR, enc).collect()
    }
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in multimodal.media_payloads(spark, SF_DIR).collect()
    }
    ref_enc = multimodal.LinearProbeEncoder(out_dim=32, seed=13)
    for doc_id in list(got)[:20]:
        want = ref_enc.encode_batch([payloads[doc_id]])[0]
        assert got[doc_id].shape == (32,)
        assert np.allclose(got[doc_id], want, atol=1e-6)


def test_onnx_encoder_fails_loudly_without_runtime(spark):
    with pytest.raises(RuntimeError, match="onnxruntime"):
        multimodal.OnnxEncoder("/nonexistent/model.onnx", dim=8)


def test_dedup_semantic_drops_have_similar_keepers(spark):
    """Every dropped vector must really be >= tau-similar to its keeper
    (same IVF list, lower id), and the drop set must be a subset of the
    all-pairs baseline's higher-id endpoints."""
    import numpy as np

    sem = {r.vec_id: (r.keeper_vec_id, r.n_similar) for r in similarity.dedup_semantic(spark, SF_DIR).collect()}
    assert sem, "semantic dedup found nothing at tau=0.45"
    vecs = {
        r.vec_id: np.asarray(r.v)
        for r in similarity._embeddings(spark, SF_DIR).collect()
    }
    for dropped, (keeper, n) in sem.items():
        assert keeper < dropped and n >= 1
        a, b = vecs[keeper], vecs[dropped]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= similarity.SEM_TAU - 1e-6, (dropped, keeper, cos)
    baseline_higher = {r.vec_b for r in dedup.dedup_embedding(spark, SF_DIR).collect()}
    assert set(sem).issubset(baseline_higher)


def test_knn_graph_properties_and_recall(spark):
    """Every vector gets ≤ K ranked neighbors in cosine-desc order;
    list-blocked neighbors must overlap the true (brute-force) top-K
    for sampled vectors — same-list vectors are the near ones by
    construction of the IVF assignment."""
    import numpy as np

    rows = similarity.knn_graph(spark, SF_DIR).collect()
    by_vec: dict[int, list] = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    assert len(by_vec) > 100
    for vid, nbrs in by_vec.items():
        nbrs.sort(key=lambda r: r.rank)
        assert [r.rank for r in nbrs] == list(range(1, len(nbrs) + 1))
        cosines = [r.cosine for r in nbrs]
        assert cosines == sorted(cosines, reverse=True)
        assert vid not in {r.neighbor_id for r in nbrs}

    vecs = {
        r.vec_id: np.asarray(r.v)
        for r in similarity._embeddings(spark, SF_DIR).collect()
    }
    hits = total = 0
    for vid in sorted(by_vec)[:20]:
        q = vecs[vid]
        sims = {
            o: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            for o, v in vecs.items()
            if o != vid
        }
        true_top = {o for o, _ in sorted(sims.items(), key=lambda kv: -kv[1])[: similarity.KNN_K]}
        got = {r.neighbor_id for r in by_vec[vid]}
        hits += len(true_top & got)
        total += similarity.KNN_K
    assert hits / total >= 0.3, f"knn_graph recall {hits}/{total}"


def test_embedding_outlier_rate_bounded(spark):
    """p99 threshold ⇒ ~1% outliers per label (≤ 5% with ties/rounding)."""
    rows = similarity.embedding_outliers(spark, SF_DIR).collect()
    n_out = sum(r.is_outlier for r in rows)
    assert 0 < n_out <= max(1, len(rows) * 0.05)


def test_langid_confusion_consistency(spark):
    """Matrix row sums equal per-language doc counts; row shares sum
    to 1; overall accuracy matches text_langid's per-doc output."""
    from samza_hello_samza_spark.operators import text_analysis as ta
    from samza_hello_samza_spark.session import load_table

    rows = ta.langid_confusion(spark, SF_DIR).collect()
    per_lang: dict[str, int] = {}
    share: dict[str, float] = {}
    correct = 0
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + r.n_docs
        share[r.lang] = share.get(r.lang, 0.0) + r.row_share
        if r.correct:
            correct += r.n_docs
    truth = {
        r.lang: r.n
        for r in load_table(spark, SF_DIR, "documents").groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    assert per_lang == truth
    for lang, s in share.items():
        assert abs(s - 1.0) < 1e-3, (lang, s)
    pred = ta.text_langid(spark, SF_DIR).collect()
    assert correct == sum(1 for p in pred if p.lang == p.pred_lang)


def test_embedding_norm_stats_bounds(spark):
    from samza_hello_samza_spark.operators import similarity

    for r in similarity.embedding_norm_stats(spark, SF_DIR).collect():
        assert 0 < r.min_norm <= r.p50_norm <= r.max_norm
        assert r.min_norm <= r.mean_norm <= r.max_norm


def test_shingle_df_cap_bounds_pair_join(spark, tmp_path):
    """Planted boilerplate: a shingle shared by > SHINGLE_MAX_DF docs
    (the "all rights reserved" failure mode) must be dropped from the
    pair-join universe in BOTH engines — the join input stays bounded
    (max shingle df <= cap) and the surviving near-dup pairs agree
    exactly between Spark and the DuckDB oracle."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    cap = dedup.SHINGLE_MAX_DF
    n_boiler = cap + 13
    rows = [
        (i, f"alpha beta gamma tok{i}a tok{i}b tok{i}c") for i in range(n_boiler)
    ]
    # three true near-dups that ALSO carry the boilerplate shingle: the
    # cap must not hide them — their pair survives via informative
    # shingles, with jaccard computed over the capped universe (4/4).
    rows += [(2000 + j, "alpha beta gamma red green blue yellow") for j in range(3)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sf_dir = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(pdf), f"{sf_dir}/documents.parquet")

    # 1. boundedness: no surviving shingle exceeds the cap, and the
    #    boilerplate shingle is gone entirely.
    sh = dedup._doc_shingles(spark, sf_dir)
    max_df = sh.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    assert max_df <= cap
    assert sh.filter(F.col("shingle") == "alpha beta gamma").count() == 0

    # 2. engine parity on the capped semantics.
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert got == {(2000, 2001): 1.0, (2000, 2002): 1.0, (2001, 2002): 1.0}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = {
        (int(a), int(b)): j
        for a, b, j in con.execute(
            dedup.ORACLES["dedup_ngram_jaccard"]
        ).fetchall()
    }
    con.close()
    assert oracle == got


def test_embedding_kmeans_matches_numpy_replica(spark):
    """Lloyd's with the same deterministic init, rounding discipline,
    and iteration count must produce identical assignments in a plain
    numpy replica — and clusters must be non-degenerate."""
    import numpy as np

    from pyspark.sql import functions as F
    from samza_hello_samza_spark.session import load_table

    got = {
        r.vec_id: (r.cluster_id, r.dist)
        for r in similarity.embedding_kmeans(spark, SF_DIR).collect()
    }

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = e.withColumn(
        "h", F.xxhash64(F.col("vec_id").cast("string"))
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.v for r in rows], dtype=np.float64)
    order = sorted(range(len(rows)), key=lambda i: (rows[i].h, rows[i].vec_id))
    cents = np.round(V[order[: similarity.KMEANS_K]], 6)

    for _ in range(similarity.KMEANS_ITERS):
        d = np.round(
            ((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 9
        )
        assign = d.argmin(axis=1)  # first-index tie-break, same as Spark
        new_cents = cents.copy()
        for c in range(similarity.KMEANS_K):
            members = V[assign == c]
            if len(members):
                new_cents[c] = np.round(members.mean(axis=0), 6)
        cents = new_cents
    d = np.round(((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 9)
    assign = d.argmin(axis=1)
    dist = np.round(np.sqrt(d.min(axis=1)), 6)

    want = {int(i): (int(a), float(x)) for i, a, x in zip(ids, assign, dist)}
    assert got == want
    sizes = {}
    for c, _x in got.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert len(sizes) >= 2  # non-degenerate clustering


def test_dedup_incremental_matches_restricted_full_pairs(spark):
    """The new-batch probe returns exactly the full-corpus minhash
    pairs restricted to one-new/one-existing (at test SF no bucket
    exceeds MAX_BUCKET, so the full join's hot-bucket cap is inert)."""
    full = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    inc = {
        tuple(sorted((r.new_doc, r.corpus_doc)))
        for r in dedup.dedup_incremental(spark, SF_DIR).collect()
    }
    is_new = lambda d: d % dedup.NEW_BATCH_MOD == 0  # noqa: E731
    want = {(a, b) for a, b in full if is_new(a) != is_new(b)}
    assert inc == want
    assert inc, "batch probe found no candidates — fixture degenerate"
    # every pair is one-new-one-existing by construction
    for r in dedup.dedup_incremental(spark, SF_DIR).collect():
        assert is_new(r.new_doc) and not is_new(r.corpus_doc)


def test_explode_nonempty_equals_explode_for_nullfree_arrays(spark):
    """explode_nonempty ≡ explode on null-free arrays (incl. empty and
    NULL arrays, which both drop); the documented boundary is arrays
    CONTAINING null elements — explode emits them, the helper filters
    them (never produced by our md5/xxhash pipelines)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, ["a", "b"]),
            (2, []),          # empty → dropped by both
            (3, None),        # NULL array → dropped by both
            (4, ["c"]),
        ],
        "id long, arr array<string>",
    )
    plain = sorted(
        map(tuple, df.select("id", F.explode("arr").alias("x")).collect())
    )
    helper = sorted(
        map(tuple, dedup.explode_nonempty(df, ["id"], F.col("arr"), "x").collect())
    )
    assert helper == plain == [(1, "a"), (1, "b"), (4, "c")]

    # the boundary: a null ELEMENT is emitted by explode, filtered here
    dfn = spark.createDataFrame([(5, ["x", None])], "id long, arr array<string>")
    assert (
        dfn.select("id", F.explode("arr").alias("x")).count() == 2
        and dedup.explode_nonempty(dfn, ["id"], F.col("arr"), "x").count() == 1
    )


def test_int8_quantization_error_bounds(spark):
    """Half-up int8 codes: per-component error ≤ scale/2 (+ float eps),
    relative L2 error small, zero scale only for zero vectors."""
    from samza_hello_samza_spark.operators.similarity import (
        embedding_quantize_int8,
    )

    rows = embedding_quantize_int8(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.scale >= 0
        # + 5e-7: max_abs_err is reported rounded to 6dp
        assert r.max_abs_err <= r.scale / 2 + 5e-7, r.vec_id
        assert 0 <= r.rel_l2_err < 0.05, r.vec_id


def test_window_incremental_flags_planted_span(spark, tmp_path):
    """A new doc (id % 10 == 0) sharing a 55-word span with a corpus
    doc is flagged with the right window counts; a clean new doc is
    reported with zero hits."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    span = [f"s{i}" for i in range(55)]
    corpus_doc = [f"a{i}" for i in range(20)] + span
    new_dup = [f"c{i}" for i in range(23)] + span
    new_clean = [f"z{i}" for i in range(60)]
    pdf = pd.DataFrame(
        [(1, " ".join(corpus_doc)), (10, " ".join(new_dup)), (20, " ".join(new_clean))],
        columns=["doc_id", "text"],
    )
    sf_dir = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(pdf), f"{sf_dir}/documents.parquet")

    got = {
        r.doc_id: r for r in dedup.dedup_window_incremental(spark, sf_dir).collect()
    }
    assert set(got) == {10, 20}
    # new_dup: 78 words → 29 windows; 6 of them (starts 23..28) sit
    # wholly inside the shared span
    assert got[10].n_windows == len(new_dup) - 50 + 1
    assert got[10].n_dup_windows == 55 - 50 + 1
    assert got[10].n_owner_docs == 1
    assert got[20].n_dup_windows == 0 and got[20].n_owner_docs == 0


def test_minhash_estimate_calibration(spark):
    """The signature estimate must track exact Jaccard: mean absolute
    error under the binomial sampling bound (~1/sqrt(24) ≈ 0.2), and
    exact duplicates estimate 1.0 with zero error."""
    rows = dedup.minhash_jaccard_estimate(spark, SF_DIR).collect()
    assert rows
    mae = sum(r.abs_err for r in rows) / len(rows)
    assert mae < 0.2, f"estimator off: MAE {mae:.3f}"
    for r in rows:
        if r.exact_jaccard == 1.0:
            assert r.n_match_perms == 24 and r.est_jaccard == 1.0
        assert 0.0 <= r.est_jaccard <= 1.0


# -- filtered vector search (r06) -------------------------------------------


def test_ann_filtered_exact_obeys_predicate_and_matches_postfilter(spark):
    """The oracle-checked exact filtered search returns only
    FILTER_LABEL vectors, and equals re-ranking the label-filtered
    brute-force scoring by hand (top-k over the filtered candidate
    set, not a post-filter of the unfiltered top-k — the classic
    filtered-ANN correctness trap)."""
    got = similarity.ann_filtered_topk(spark, SF_DIR).collect()
    assert len(got) == similarity.TOP_K
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    assert all(labels[r.vec_id] == similarity.FILTER_LABEL for r in got)

    # hand-built reference: score EVERYTHING, filter, then take top-k
    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # (_rerank limits to TOP_K before the filter could apply — rebuild
    # the unlimited scoring expression by hand)
    qvec = similarity._query_vector(spark, SF_DIR)
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    import numpy as np

    qnorm = float(np.linalg.norm(qvec))
    full = (
        e.filter(F.col("vec_id") != similarity.QUERY_VEC_ID)
        .withColumn(
            "cosine",
            F.round(
                similarity._dot(F.col("v"), qv)
                / (similarity._norm(F.col("v")) * F.lit(qnorm)),
                6,
            ),
        )
        .filter(F.col("label") == similarity.FILTER_LABEL)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(similarity.TOP_K)
        .collect()
    )
    assert [(r.vec_id, r.cosine) for r in got] == [
        (r.vec_id, r.cosine) for r in full
    ]


def test_ann_filtered_ivf_recall_and_predicate(spark):
    """Filtered IVF: every result carries the filter label, scores are
    sorted, and recall vs the exact filtered baseline is healthy."""
    exact = [r.vec_id for r in similarity.ann_filtered_topk(spark, SF_DIR).collect()]
    got = similarity.ann_filtered_ivf_topk(spark, SF_DIR).collect()
    assert 0 < len(got) <= similarity.TOP_K
    cosines = [r.cosine for r in got]
    assert cosines == sorted(cosines, reverse=True)
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    assert all(labels[r.vec_id] == similarity.FILTER_LABEL for r in got)
    overlap = len(set(exact) & {r.vec_id for r in got}) / len(exact)
    assert overlap >= 0.2, f"filtered-IVF recall {overlap:.2f} suspiciously low"


def test_ann_filtered_ivf_probe_prunes_and_pushes_label(spark):
    """The filtered probe composes BOTH prunings: list_id partition
    filters cut files at listing (≤ NPROBE of NLIST partitions) and
    the label equality is pushed to the parquet reader inside the
    pruned scan (PushedFilters, not a post-scan Filter-only plan)."""
    from samza_hello_samza_spark.operators import ann_index

    qvec = similarity._query_vector(spark, SF_DIR)
    idx = ann_index.build_ivf_index(
        spark, SF_DIR, similarity.IVF_NLIST, attrs=("label",)
    )
    cand = ann_index.probe_ivf_index(
        spark,
        idx,
        qvec,
        similarity.IVF_NPROBE,
        where=F.col("label") == similarity.FILTER_LABEL,
    )
    plan = _executed_plan(cand, spark)
    assert "PartitionFilters" in plan and "list_id" in plan
    assert "PushedFilters" in plan and "EqualTo(label," in plan
    n = _scanned_partitions(cand)
    assert 0 < n <= similarity.IVF_NPROBE, (
        f"filtered probe read {n} partitions; expected ≤{similarity.IVF_NPROBE}"
    )


def test_ann_filtered_ivf_deterministic(spark):
    a = [tuple(r) for r in similarity.ann_filtered_ivf_topk(spark, SF_DIR).collect()]
    b = [tuple(r) for r in similarity.ann_filtered_ivf_topk(spark, SF_DIR).collect()]
    assert a == b


def test_ann_ivfpq_recall(spark):
    """IVFPQ top-k overlaps brute-force top-k; scores sorted. With
    residual encoding + 64-candidate exact re-rank, recall should be
    in the same band as the component indexes."""
    brute = [r.vec_id for r in similarity.ann_bruteforce_topk(spark, SF_DIR).collect()]
    ivfpq = similarity.ann_ivfpq_topk(spark, SF_DIR).collect()
    ids = [r.vec_id for r in ivfpq]
    assert len(ids) == similarity.TOP_K
    cosines = [r.cosine for r in ivfpq]
    assert cosines == sorted(cosines, reverse=True)
    overlap = len(set(brute) & set(ids)) / len(brute)
    assert overlap >= 0.2, f"IVFPQ recall {overlap:.2f} suspiciously low"


def test_ann_ivfpq_deterministic(spark):
    a = [tuple(r) for r in similarity.ann_ivfpq_topk(spark, SF_DIR).collect()]
    b = [tuple(r) for r in similarity.ann_ivfpq_topk(spark, SF_DIR).collect()]
    assert a == b


def test_ann_ivfpq_probe_composes_both_prunings(spark):
    """The IVFADC probe must cut files at listing (≤ NPROBE of NLIST
    list_id partitions) AND read only the code columns inside them —
    the raw vectors never enter the scan (codes/ stores none)."""
    from samza_hello_samza_spark.operators import ann_index

    qvec = similarity._query_vector(spark, SF_DIR)
    idx = ann_index.build_ivfpq_index(
        spark, SF_DIR, similarity.IVF_NLIST, similarity.PQ_M, similarity.PQ_KSUB
    )
    cand = ann_index.probe_ivfpq_index(
        spark, idx, qvec, similarity.IVF_NPROBE, similarity.PQ_CANDIDATES
    )
    plan = _executed_plan(cand, spark)
    assert "PartitionFilters" in plan and "list_id" in plan
    n = _scanned_partitions(cand)
    assert 0 < n <= similarity.IVF_NPROBE, (
        f"IVFPQ probe read {n} partitions; expected ≤{similarity.IVF_NPROBE}"
    )
    # column pruning: the scan reads vec_id + code columns only
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "code_0" in m.group(1) and "v:" not in m.group(1), m and m.group(1)
    # top-k is distributed, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_ann_ivfpq_residuals_beat_no_rerank_floor(spark):
    """The ADC candidate set itself (before exact re-rank) must already
    contain most of the final answer — the re-rank is a refinement,
    not a rescue: every returned id is one of the probe's candidates."""
    from samza_hello_samza_spark.operators import ann_index

    qvec = similarity._query_vector(spark, SF_DIR)
    idx = ann_index.build_ivfpq_index(
        spark, SF_DIR, similarity.IVF_NLIST, similarity.PQ_M, similarity.PQ_KSUB
    )
    cand = {
        r.vec_id
        for r in ann_index.probe_ivfpq_index(
            spark, idx, qvec, similarity.IVF_NPROBE, similarity.PQ_CANDIDATES
        ).collect()
    }
    final = {r.vec_id for r in similarity.ann_ivfpq_topk(spark, SF_DIR).collect()}
    assert final <= cand


def test_ann_ivfpq_append_is_probe_visible_and_batch_consistent(spark, tmp_path):
    """Appends encode against the FROZEN centroids/codebooks: an
    appended copy of an existing vector must land in the same list
    with the same codes, and a probe near it must surface the new id."""
    import numpy as np
    from samza_hello_samza_spark.operators import ann_index

    idx = ann_index.build_ivfpq_index(
        spark, SF_DIR, similarity.IVF_NLIST, similarity.PQ_M, similarity.PQ_KSUB
    )
    codes_dir = idx + "/codes"
    base = spark.read.parquet(codes_dir)
    # clone vector 7 under a fresh id and append it
    src = similarity._embeddings(spark, SF_DIR).filter(F.col("vec_id") == 7)
    delta = src.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "v")
    ann_index.append_ivfpq_index(spark, idx, delta)
    after = spark.read.parquet(codes_dir)
    assert after.count() == base.count() + 1
    orig = base.filter(F.col("vec_id") == 7).collect()[0]
    new = after.filter(F.col("vec_id") == 1_000_007).collect()[0]
    code_cols = [c for c in base.columns if c.startswith("code_")]
    assert new.list_id == orig.list_id
    assert [new[c] for c in code_cols] == [orig[c] for c in code_cols]
    # the probe ranks the clone identically to its original (ADC
    # scores are code-determined) — both appear among candidates for
    # a query at vector 7 itself
    qvec = np.asarray(src.collect()[0].v, dtype=float)
    cand = ann_index.probe_ivfpq_index(
        spark, idx, qvec, similarity.IVF_NPROBE, similarity.PQ_CANDIDATES
    ).collect()
    by_id = {r.vec_id: r.adc_score for r in cand}
    assert 7 in by_id and 1_000_007 in by_id
    assert by_id[7] == by_id[1_000_007]


def test_binary_signature_packing_matches_numpy(spark):
    """Packed sign words and popcount Hamming agree with a direct
    numpy computation for every vector (integer-exactness is the
    whole contract of the binary family)."""
    import numpy as np

    sig = similarity._binary_signatures(spark, SF_DIR).collect()
    qvec = similarity._query_vector(spark, SF_DIR)
    qwords = similarity._sign_words_py(qvec)
    qbits = np.asarray(qvec) > 0
    for r in sig[:200]:
        bits = np.asarray(r.v) > 0
        want_words = similarity._sign_words_py(np.asarray(r.v))
        assert [r.w0, r.w1] == want_words, f"packing mismatch vec {r.vec_id}"
        want_h = int((bits != qbits).sum())
        got_h = sum(
            bin(gw ^ qw).count("1") for gw, qw in zip(want_words, qwords)
        )
        assert got_h == want_h, f"hamming mismatch vec {r.vec_id}"


def test_ann_binary_recall_and_rerank_superset(spark):
    """Hamming ranking overlaps exact-cosine top-k (sign bits keep
    angular structure), and the reranked results are drawn from the
    Hamming top-M shortlist with exact-cosine scores."""
    brute = {r.vec_id for r in similarity.ann_bruteforce_topk(spark, SF_DIR).collect()}
    binary = [r.vec_id for r in similarity.ann_binary_topk(spark, SF_DIR).collect()]
    assert len(binary) == similarity.TOP_K
    rerank = similarity.ann_binary_rerank_topk(spark, SF_DIR).collect()
    assert len(rerank) == similarity.TOP_K
    overlap = len(brute & {r.vec_id for r in rerank}) / len(brute)
    assert overlap >= 0.2, f"binary rerank recall {overlap:.2f} suspiciously low"
    # rerank rows carry true hamming + cosine consistent with brute order
    exact = {
        r.vec_id: r.cosine
        for r in similarity.ann_bruteforce_topk(spark, SF_DIR).collect()
    }
    for r in rerank:
        if r.vec_id in exact:
            assert abs(r.cosine - exact[r.vec_id]) < 1e-9


def test_ann_recall_curve_consistent_with_method_keys(spark):
    """Each row's hit count must equal the intersection of that
    method's top-k with the exact top-k, recomputed from the
    individual keys; recall is the integer ppm of hits over k."""
    exact = {r.vec_id for r in similarity.ann_bruteforce_topk(spark, SF_DIR).collect()}
    got = {
        r.method: (r.n_hits, r.recall_ppm)
        for r in similarity.ann_recall_curve(spark, SF_DIR).collect()
    }
    assert set(got) == {"binary", "mrl", "mrl32", "sq8"}
    for name, fn in [
        ("binary", similarity.ann_binary_topk),
        ("mrl", similarity.ann_mrl_topk),
        ("mrl32", similarity.ann_mrl32_topk),  # r08 second rung
        ("sq8", similarity.ann_sq8_topk),
    ]:
        ids = {r.vec_id for r in fn(spark, SF_DIR).collect()}
        hits = len(ids & exact)
        assert got[name] == (hits, 1000000 * hits // similarity.TOP_K), name
    # the 8-bit rung should never trail the 1-bit rung on recall
    assert got["sq8"][0] >= got["binary"][0]


def test_corpus_dedup_report_consistent_with_relations(spark):
    """Every figure equals the relation it summarizes."""
    rows = dedup.corpus_dedup_report(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    exact = dedup.dedup_exact(spark, SF_DIR).collect()
    assert r.n_docs == len(exact)
    dups = [e for e in exact if e.is_duplicate]
    assert r.n_exact_dup_docs == len(dups)
    assert r.n_exact_groups == len({e.canonical_doc_id for e in dups})
    assert r.n_near_pairs == dedup.dedup_ngram_jaccard(spark, SF_DIR).count()
    cl = dedup.dedup_clusters(spark, SF_DIR).collect()
    assert r.n_clustered_docs == len(cl)
    assert r.n_clusters == len({c.cluster_id for c in cl})
    assert r.exact_unique_ppm == 1000000 * (r.n_docs - r.n_exact_dup_docs) // r.n_docs


def test_dedup_lsh_eval_stratum_is_exact_restriction(spark, duck):
    """r08: the sampled-stratum eval must measure the SAME relations —
    each stratum pair relation equals its full-corpus twin restricted
    to pairs with both endpoints in the stratum (truth by the
    pure-pair-function argument; candidates because signatures are
    per-doc pure) — and the report hash-matches its DuckDB twin."""
    from tests.conftest import assert_matches_oracle

    docs = dedup._doc_stratum(spark, SF_DIR)
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert 0 < len(ids)

    st_truth = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_prefix_filter(spark, SF_DIR, docs=docs).collect()
    }
    full_truth = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_prefix_filter(spark, SF_DIR).collect()
    }
    assert st_truth == {
        p for p in full_truth if p[0] in ids and p[1] in ids
    }

    st_cand = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF_DIR, docs=docs).collect()
    }
    full_cand = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    assert st_cand == {p for p in full_cand if p[0] in ids and p[1] in ids}

    # the report is the confusion composition of exactly those sets
    row = dedup.dedup_lsh_eval_stratum(spark, SF_DIR).collect()[0]
    assert row.n_true_pairs == len(st_truth)
    assert row.n_lsh_pairs == len(st_cand)
    assert row.n_hits == len(st_truth & st_cand)

    assert_matches_oracle(
        spark,
        duck,
        dedup.QUERIES["dedup_lsh_eval_stratum"],
        dedup.ORACLES["dedup_lsh_eval_stratum"],
    )


def test_ann_mrl_second_rung_separates_and_matches_oracle(spark, duck):
    """r08: the prefix-32 rung must (a) hash-match its DuckDB twin,
    (b) re-rank exactly (descending full-dim cosine), and (c) sit at
    or above the 16-rung's recall in the registered curve — the
    measured separation (tools/mrl_rung_probe.py: raw shortlist
    recall ~doubles 16→32 at both probe SFs) that justified adding
    the rung."""
    assert_matches_oracle(
        spark,
        duck,
        similarity.QUERIES["ann_mrl32_topk"],
        similarity.ORACLES["ann_mrl32_topk"],
    )
    rows = similarity.ann_mrl32_topk(spark, SF_DIR).collect()
    assert len(rows) == similarity.TOP_K
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)

    curve = {r.method: r.recall_ppm for r in similarity.ann_recall_curve(spark, SF_DIR).collect()}
    assert set(curve) == {"binary", "mrl", "mrl32", "sq8"}
    # a wider prefix can only widen the shortlist's information; on a
    # single query ties are possible, so pin >= (the probe pins the
    # multi-query separation offline)
    assert curve["mrl32"] >= curve["mrl"]


def test_lsh_band_sweep_nesting_and_oracle(spark, duck):
    """r08b: the (bands × rows) calibration table — candidate sets
    NEST where the band blocks align (a 12×2 band match implies both
    its 24×1 halves match; a 6×4 match implies both its 12×2 halves),
    so counts and recall must be monotone along 24×1 ⊇ 12×2 ⊇ 6×4 and
    24×1 ⊇ 8×3; the 12×2 row must agree with the registered stratum
    eval (same universe, same banding); and the whole table
    hash-matches its DuckDB twin."""
    rows = {
        (r.bands, r.rows_per_band): r
        for r in dedup.lsh_band_sweep(spark, SF_DIR).collect()
    }
    assert set(rows) == set(dedup.LSH_SWEEP_CONFIGS)
    c = {k: rows[k].n_candidates for k in rows}
    h = {k: rows[k].n_hits for k in rows}
    assert c[(24, 1)] >= c[(12, 2)] >= c[(6, 4)]
    assert c[(24, 1)] >= c[(8, 3)]
    assert h[(24, 1)] >= h[(12, 2)] >= h[(6, 4)]
    assert h[(24, 1)] >= h[(8, 3)]

    ev = dedup.dedup_lsh_eval_stratum(spark, SF_DIR).collect()[0]
    assert rows[(12, 2)].n_candidates == ev.n_lsh_pairs
    assert rows[(12, 2)].n_hits == ev.n_hits
    assert rows[(12, 2)].n_true_pairs == ev.n_true_pairs

    assert_matches_oracle(
        spark,
        duck,
        dedup.QUERIES["lsh_band_sweep"],
        dedup.ORACLES["lsh_band_sweep"],
    )

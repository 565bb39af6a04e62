"""Approximate-nearest-neighbor search over the embeddings table.

- ``ann_bruteforce_topk``: exact cosine top-k against a fixed query
  vector (vec_id 0). Oracle-checked vs DuckDB list_cosine_similarity.
  Dot products are JVM-side zip_with/aggregate folds — correctness
  baseline and small-candidate-set scorer.
- ``ann_lsh_topk``: random-hyperplane LSH over a MATERIALIZED band
  table (``ann_index.build_lsh_index``, partitioned by (band, code));
  the probe reads only the partitions matching the query's band codes
  and exact-cosine re-ranks that candidate set. Rows-only check (LSH
  recall is property-tested against brute force in tests/).

- ``ann_ivf_topk``: inverted-file index — corpus coarse-quantized to
  NLIST centroid lists and written ``partitionBy(list_id)``; probes
  scan only the query's NPROBE nearest lists (partition pruning) and
  re-rank inside them. Rows-only check; recall property-tested.

Scale notes: brute force is a full scan per query — fine for one
query as the exactness baseline, wrong as the serving path. LSH/IVF
probes are pruned reads of a written index (pruning is plan-asserted
in tests/test_llm_ops.py); build cost is paid once per corpus.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import binary_sig as _bsig
from ..functions import sq8 as _sq8
from ..session import load_table

TOP_K = 10
QUERY_VEC_ID = 0
N_PLANES = 16  # two 8-bit bands
DIM = 64

_rng = random.Random(7)
#: deterministic hyperplanes, shipped to executors as a broadcast constant.
PLANES = np.array(
    [[_rng.gauss(0.0, 1.0) for _ in range(DIM)] for _ in range(N_PLANES)]
)


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec_id 0 (deterministic tiebreak)."""
    e = _embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm(F.col("v")).alias("qnorm")
    )
    cand = e.filter(F.col("vec_id") != QUERY_VEC_ID)
    return (
        cand.crossJoin(F.broadcast(q))
        .withColumn(
            "cosine", F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qnorm")), 6)
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "cosine")
    )


LSH_BAND_BITS = 4
LSH_N_BANDS = N_PLANES // LSH_BAND_BITS  # 4 bands of 4 bits


#: per-corpus query-vector cache: the standard probe vector (vec_id
#: QUERY_VEC_ID) is a constant of the corpus dir, and every ANN probe
#: family collects it per call — one saved 1-row job per probe across
#: ~20 registered keys. Plain numpy (no Spark objects): safe across
#: session restarts, same discipline as _SQ8_BOUNDS_CACHE. Keyed on
#: (sf_dir, embeddings fingerprint) so a rewritten corpus invalidates
#: instead of serving a stale vector (pricing-cache discipline).
_QUERY_VEC_CACHE: dict[tuple[str, tuple], np.ndarray] = {}


def _embeddings_fingerprint(sf_dir: str) -> tuple:
    """(mtime_ns, size) pairs of the corpus' embeddings parquet file(s)
    — cheap stat-only fingerprint, no Spark job."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    out = []
    if os.path.isdir(path):
        for dirpath, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(dirpath, f))
                    out.append((st.st_mtime_ns, st.st_size))
    elif os.path.exists(path):
        st = os.stat(path)
        out.append((st.st_mtime_ns, st.st_size))
    return tuple(out)


def _query_vector(spark: SparkSession, sf_dir: str) -> np.ndarray:
    key = (sf_dir, _embeddings_fingerprint(sf_dir))
    hit = key in _QUERY_VEC_CACHE
    if not hit:
        row = (
            _embeddings(spark, sf_dir)
            .filter(F.col("vec_id") == QUERY_VEC_ID)
            .collect()[0]
        )  # 1-row collect: the query itself
        _QUERY_VEC_CACHE.clear()  # one corpus at a time: no unbounded growth
        _QUERY_VEC_CACHE[key] = np.asarray(row.v)
    _query_vector.last_cached = hit
    return _QUERY_VEC_CACHE[key]


_query_vector.last_cached = False


def _rerank(cand: DataFrame, qvec: np.ndarray) -> DataFrame:
    """Exact cosine re-rank of a candidate set against a literal query.

    The query vector is inlined as an array literal (it IS a constant
    of the query), so scoring is a single pruned scan — no join at all.
    """
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = float(np.linalg.norm(qvec))
    return (
        cand.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("cosine", F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * F.lit(qnorm)), 6))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "cosine")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine top-10 of vec_id 0 over the MATERIALIZED index.

    The band table (one row per (band, code, vec_id), partitioned by
    (band, code)) is built once per corpus by ``ann_index``; the probe
    reads exactly the 4 partitions matching the query's band codes —
    partition pruning, not a post-scan filter. Candidates collide with
    the query in any of 4 4-bit bands of the 16-bit hyperplane code:
    on near-uniform vectors that keeps ~50% neighbor recall while
    reading ~4/16 of the index; real clustered embeddings prune far
    harder. Band width/count are the recall-vs-cost dial.
    """
    from . import ann_index

    idx = ann_index.build_lsh_index(spark, sf_dir, PLANES, LSH_BAND_BITS)
    qvec = _query_vector(spark, sf_dir)
    cand = ann_index.probe_lsh_index(spark, idx, qvec, PLANES, LSH_BAND_BITS)
    return _rerank(cand, qvec)


#: multi-probe perturbations per band: each band probes its own code
#: plus the 2 lowest-margin single-bit flips → 3 of 16 codes per
#: band, 12 of 64 (band, code) partitions read vs single-probe's 4.
LSH_MULTIPROBE_FLIPS = 2


def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH cosine top-10 over the SAME materialized band
    table as ``ann_lsh_topk`` — recall without more tables: each band
    probes its own bucket plus the ``LSH_MULTIPROBE_FLIPS``
    lowest-margin bit-flip buckets (the hyperplanes the query is
    closest to — where a true neighbor's sign most plausibly
    differs), in a pinned deterministic order (margin asc, plane
    index tiebreak; see ``ann_index.multiprobe_band_codes``). The
    candidate read is still partition pruning — 12 of 64 (band, code)
    dirs instead of 4 — and the exact-cosine re-rank is unchanged.

    The production trade this key encodes: single-probe LSH buys
    recall with MORE TABLES (more write amplification, more ingest
    cost); multi-probe buys it with more PROBES of one table — at
    100 TB the index is written once and probed millions of times,
    and probe-side partitions are the cheap currency. Rows-only for
    the same reason as ``ann_lsh_topk`` (float sign boundaries are
    not bit-stable cross-engine); the recall/cost point vs
    single-probe is measured by ``lsh_multiprobe_eval`` and
    bound-asserted in tests."""
    from . import ann_index

    idx = ann_index.build_lsh_index(spark, sf_dir, PLANES, LSH_BAND_BITS)
    qvec = _query_vector(spark, sf_dir)
    cand = ann_index.probe_lsh_index_multi(
        spark, idx, qvec, PLANES, LSH_BAND_BITS, LSH_MULTIPROBE_FLIPS
    )
    return _rerank(cand, qvec)


def lsh_multiprobe_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-probe decision row: candidate count, top-10 hits and
    ppm recall against the exact cosine top-10, for single-probe vs
    multi-probe over the SAME band table — the ``ann_recall_curve``
    discipline applied to the probe-count dial (is the extra
    partition read buying recall?). Rows-only (candidate membership
    rides float sign boundaries), but the shape is pinned by pytest:
    multi-probe candidates are a superset of single-probe's, recall
    is monotone in probe count, and the candidate read stays ≤
    (1 + flips) × single-probe's.

    r10 adds the ``multi_snapshot`` row (VERDICT r09 #2): the same
    pinned perturbation sequence probed through the COMMITTED
    manifest (``probe_lsh_snapshot_multi`` — the streaming serving
    tier's read path). With the snapshot current it must EQUAL the
    ``multi`` row exactly (candidate membership is a pure function of
    (query, planes, committed file set)) — the batch-parity claim as
    a measured relation, pytest-pinned."""
    from . import ann_index

    idx = ann_index.build_lsh_index(spark, sf_dir, PLANES, LSH_BAND_BITS)
    # commit-once: the serving probe resolves files through a manifest
    # (the _sig_index discipline — create-once corpus state)
    if not ann_index.read_index_manifest(idx)["files"]:
        ann_index.commit_index_snapshot(idx)
    qvec = _query_vector(spark, sf_dir)
    exact = ann_bruteforce_topk(spark, sf_dir).select("vec_id")
    variants = [
        (
            "single",
            ann_index.probe_lsh_index(spark, idx, qvec, PLANES, LSH_BAND_BITS),
        ),
        (
            "multi",
            ann_index.probe_lsh_index_multi(
                spark, idx, qvec, PLANES, LSH_BAND_BITS, LSH_MULTIPROBE_FLIPS
            ),
        ),
        (
            "multi_snapshot",
            ann_index.probe_lsh_snapshot_multi(
                spark, idx, qvec, PLANES, LSH_BAND_BITS, LSH_MULTIPROBE_FLIPS
            ),
        ),
    ]
    out = None
    for name, cand in variants:
        cand = cand.filter(F.col("vec_id") != QUERY_VEC_ID).localCheckpoint()
        topk = _rerank(cand, qvec).select("vec_id")
        row = (
            cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
            .crossJoin(
                F.broadcast(  # 1-row aggregate: BNLJ, never a cartesian
                    topk.join(exact, "vec_id", "left_semi").agg(
                        F.count(F.lit(1)).cast("long").alias("n_hits")
                    )
                )
            )
            .select(
                F.lit(name).alias("variant"),
                "n_candidates",
                "n_hits",
                F.expr(f"(1000000 * n_hits) div {TOP_K}")
                .cast("long")
                .alias("recall_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


IVF_NLIST = 16
IVF_NPROBE = 4


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN over the MATERIALIZED inverted-file index.

    Build (once per corpus, in ``ann_index``): centroids = first
    ``IVF_NLIST`` vectors by vec_id (deterministic, bounded collect);
    every vector assigned to its max-cosine centroid by an
    Arrow-batched pandas_udf; corpus written ``partitionBy(list_id)``
    with the centroid table alongside.

    Probe: read the centroid table (NLIST rows), pick the query's
    ``IVF_NPROBE`` nearest lists driver-side, scan ONLY those
    partitions (``list_id IN (...)`` is a partition filter — the
    candidate cut happens at file listing, before any compute), exact
    cosine re-rank inside them.

    Rows-only check (float argmax near list boundaries isn't
    bit-stable across engines); recall vs brute force is asserted in
    tests, and partition pruning in the probe scan is plan-asserted.
    """
    from . import ann_index

    idx = ann_index.build_ivf_index(spark, sf_dir, IVF_NLIST)
    qvec = _query_vector(spark, sf_dir)
    cand = ann_index.probe_ivf_index(spark, idx, qvec, IVF_NPROBE)
    return _rerank(cand, qvec)


PQ_M = 8
PQ_KSUB = 16
PQ_CANDIDATES = 64


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: ADC candidate scan + exact re-rank.

    The memory-bound serving path: the corpus lives as M=8 one-byte
    codes per vector (32× smaller than float32), the probe ranks the
    WHOLE corpus by asymmetric-distance table lookups while reading
    only the code columns (column pruning is plan-asserted in tests),
    and the raw vectors are touched just for the ``PQ_CANDIDATES``
    finalists' exact-cosine re-rank — a broadcast semi-join on vec_id.
    Rows-only check (float argmin in the encoder isn't bit-stable
    across engines); recall vs brute force is property-tested.
    """
    from . import ann_index

    idx = ann_index.build_pq_index(spark, sf_dir, PQ_M, PQ_KSUB)
    qvec = _query_vector(spark, sf_dir)
    cand_ids = ann_index.probe_pq_index(spark, idx, qvec, PQ_CANDIDATES).select("vec_id")
    cand = _embeddings(spark, sf_dir).join(F.broadcast(cand_ids), "vec_id", "left_semi")
    return _rerank(cand, qvec)


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ (FAISS IVFADC) ANN: coarse-pruned lists × residual-PQ ADC.

    The composed serving index — what a 100 TB vector deployment
    actually runs: the coarse step reads ``IVF_NPROBE``/``IVF_NLIST``
    of the corpus at FILE-LISTING time (partition pruning), the ADC
    step reads only the one-byte residual-code columns inside those
    lists (column pruning, ~m bytes/vector), and the raw vectors are
    touched just for the ``PQ_CANDIDATES`` finalists' exact-cosine
    re-rank (broadcast semi-join). Compared to its components: probe
    cost is ~nprobe/nlist of ``ann_pq_topk``'s whole-corpus ADC scan,
    with better quantization than plain PQ at equal code budget
    because residuals concentrate near zero (Jégou et al. 2011).

    Rows-only check (float argmax/argmin in the coarse assign and
    encoder aren't bit-stable across engines); recall vs brute force,
    determinism, and BOTH prunings are pytest-asserted.
    """
    from . import ann_index

    idx = ann_index.build_ivfpq_index(spark, sf_dir, IVF_NLIST, PQ_M, PQ_KSUB)
    qvec = _query_vector(spark, sf_dir)
    cand_ids = ann_index.probe_ivfpq_index(
        spark, idx, qvec, IVF_NPROBE, PQ_CANDIDATES
    ).select("vec_id")
    cand = _embeddings(spark, sf_dir).join(
        F.broadcast(cand_ids), "vec_id", "left_semi"
    )
    return _rerank(cand, qvec)


#: filtered-search predicate: candidates must carry this label. The
#: query vector (vec_id 0) has label 5, so the filter is a genuine
#: cross-label constraint, not a same-class search.
FILTER_LABEL = 2


def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact FILTERED vector search: cosine top-10 of vec_id 0 among
    vectors with ``label = FILTER_LABEL`` — the metadata-predicate +
    similarity serving shape (every real vector store exposes it).

    Correctness anchor of the filtered family: one corpus scan with
    the label equality pushed to the parquet reader (predicate
    pushdown — non-matching rows never rehydrate their vectors), then
    the same inlined-literal re-rank as the unfiltered baseline.
    Oracle-checked against DuckDB's list_cosine_similarity."""
    e = load_table(spark, sf_dir, "embeddings")
    cand = e.filter(F.col("label") == FILTER_LABEL).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return _rerank(cand, _query_vector(spark, sf_dir))


def ann_filtered_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN over the attr-bearing IVF layout — the scale path
    of ``ann_filtered_topk``.

    The index stores ``label`` ALONGSIDE each vector (the filtered-
    search layout decision: metadata lives with the codes, so a probe
    never joins back to the base table). The probe composes BOTH
    prunings: ``list_id IN (nprobe lists)`` cuts files at listing,
    and the label equality is a parquet data filter inside the pruned
    scan — each plan-asserted in tests. Pre-filtering (filter, then
    rank survivors) keeps top-k semantics exact within the probed
    lists; recall vs the exact filtered baseline is property-tested.
    Rows-only (float argmax near list boundaries, like ann_ivf_topk).
    """
    from . import ann_index

    idx = ann_index.build_ivf_index(spark, sf_dir, IVF_NLIST, attrs=("label",))
    qvec = _query_vector(spark, sf_dir)
    cand = ann_index.probe_ivf_index(
        spark, idx, qvec, IVF_NPROBE, where=F.col("label") == FILTER_LABEL
    )
    return _rerank(cand, qvec)


# -- binary quantization: sign bits + popcount Hamming -------------------

#: DIM sign bits packed little-endian-by-dimension into 32-bit words
#: (32 so each word's 2^i stays exactly representable in double; two
#: longs cover DIM=64). Packing/popcount primitives live in
#: ``functions/binary_sig.py`` — shared with the committed index
#: layout (``ann_index`` stores the words next to the IVF codes).
BINARY_WORD_BITS = _bsig.WORD_BITS
BINARY_WORDS = DIM // BINARY_WORD_BITS
BINARY_RERANK_M = 50


def _sign_word_cols(v: F.Column) -> list[F.Column]:
    return _bsig.sign_word_cols(v, DIM)


def _sign_words_py(qvec: np.ndarray) -> list[int]:
    return _bsig.sign_words_py(qvec)


def _hamming_col(qwords: list[int]) -> F.Column:
    return _bsig.hamming_col(qwords)


def _binary_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embeddings(spark, sf_dir)
    return e.select("vec_id", "v", *_sign_word_cols(F.col("v")))


def ann_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: rank by Hamming distance between sign
    signatures — the 1-bit-per-dimension compression every large
    vector store ships (FAISS binary indexes, Elasticsearch BBQ).

    Sign bits (x > 0) pack into DIM/8 bytes per vector; distance is
    popcount(xor) over two longs — whole-stage-codegen integer ops,
    no float math in the ranking. At scale the signature column is
    materialized next to the vectors (``ann_index`` layout
    discipline), so a probe scans 16 bytes/vector instead of 512 —
    a 32× I/O cut before any pruning, and the reason the technique
    survives at 100 TB: the whole signature file set fits page cache
    where raw vectors cannot. Here the signatures are derived in the
    same single scan the query reads (build-on-read keeps the key
    self-contained; the materialized path is the store's).

    Integer-exact end-to-end (sign compare + popcount + vec_id
    tiebreak), hence ORACLE-CHECKED — unlike the float LSH/IVF/PQ
    probe families. Recall vs exact cosine is property-tested.
    """
    qwords = _sign_words_py(_query_vector(spark, sf_dir))
    return (
        _binary_signatures(spark, sf_dir)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("hamming", _hamming_col(qwords))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "hamming")
    )


def ann_binary_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full binary-quantization serving loop: Hamming top-M
    shortlist (integer ranking over packed sign bits), then exact
    cosine re-rank of the M finalists against the raw vectors — the
    oversample-and-rerank pattern (Elasticsearch BBQ, FAISS
    IndexBinaryFlat + refine).

    Scale shape: stage 1 touches signatures only (32× lighter scan);
    stage 2 rehydrates exactly M=50 raw vectors via a broadcast
    semi-join — per-query float work is O(M·DIM) regardless of corpus
    size. Both stages deterministic (vec_id tiebreaks at the M cut
    and the final round-6 cosine), so the composition is
    ORACLE-CHECKED.
    """
    qvec = _query_vector(spark, sf_dir)
    qwords = _sign_words_py(qvec)
    shortlist = (
        _binary_signatures(spark, sf_dir)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("hamming", _hamming_col(qwords))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(BINARY_RERANK_M)
        .select("vec_id", "hamming")
    )
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = float(np.linalg.norm(qvec))
    return (
        _embeddings(spark, sf_dir)
        .join(F.broadcast(shortlist), "vec_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * F.lit(qnorm)), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "hamming", "cosine")
    )


def _sig_index(spark: SparkSession, sf_dir: str) -> str:
    """The committed signature-bearing IVF layout (built once per
    corpus, snapshot-committed so probes resolve a manifest): stores
    label (filtered search) AND the packed sign-bit words next to
    each vector."""
    from . import ann_index

    idx = ann_index.build_ivf_index(
        spark, sf_dir, IVF_NLIST, attrs=("label",), sigs=True
    )
    corpus = f"{idx}/corpus"
    if not ann_index.read_index_manifest(corpus)["files"]:
        ann_index.commit_index_snapshot(corpus)
    return idx


def ann_binary_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_binary_topk`` served from the COMMITTED index layout:
    the Hamming scan reads the materialized signature words (16
    bytes/vector for DIM=64) of a manifest-resolved snapshot — the
    raw vector column never enters the read schema (plan-asserted).

    This is the materialized-path twin of ``ann_binary_topk`` (which
    derives signatures in-scan, self-contained): same ranking, 32×
    lighter scan, and the layout keeps signatures exact through
    append/upsert/rebalance/CDC (derived-column recompute in
    ``ann_index``). Integer-exact end-to-end, hence ORACLE-CHECKED —
    same oracle as the in-scan key, because materialization must not
    change a single result row.
    """
    from . import ann_index

    idx = _sig_index(spark, sf_dir)
    qwords = _sign_words_py(_query_vector(spark, sf_dir))
    return (
        ann_index.probe_binary_snapshot(spark, idx, qwords)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "hamming")
    )


def ann_filtered_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED binary ANN over the committed layout — the production
    vector-store serving shape (metadata predicate + oversampled
    quantized shortlist + exact re-rank) with every stage exact:

    1. label equality pushed to the parquet reader INSIDE the pruned
       signature scan (the ``ann_filtered_ivf_topk`` discipline —
       top-k is taken over the FILTERED candidate set, never a
       post-filter of an unfiltered top-k);
    2. Hamming top-``BINARY_RERANK_M`` shortlist over the packed
       words (integer ranking, vec_id tiebreak);
    3. exact cosine re-rank of the M finalists against raw vectors
       (broadcast semi-join — O(M·DIM) float work per query).

    Unlike the float IVF probes, every cut here is integer- or
    round(6)-deterministic, so the COMPOSED probe is ORACLE-CHECKED
    at both SFs.
    """
    from . import ann_index

    idx = _sig_index(spark, sf_dir)
    qvec = _query_vector(spark, sf_dir)
    shortlist = (
        ann_index.probe_binary_snapshot(
            spark, idx, _sign_words_py(qvec),
            where=F.col("label") == FILTER_LABEL,
        )
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(BINARY_RERANK_M)
        .select("vec_id", "hamming")
    )
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = float(np.linalg.norm(qvec))
    return (
        _embeddings(spark, sf_dir)
        .join(F.broadcast(shortlist), "vec_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * F.lit(qnorm)), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "hamming", "cosine")
    )


SQ8_RERANK_M = 50

#: per-corpus bound cache: the bounds are a deterministic pure
#: function of the embeddings table, so repeat probes (and the rerank
#: key's second pass) skip the training job.
_SQ8_BOUNDS_CACHE: dict[str, tuple[list[float], list[float]]] = {}


def _sq8_bounds(spark: SparkSession, sf_dir: str) -> tuple[list[float], list[float]]:
    if sf_dir not in _SQ8_BOUNDS_CACHE:
        _SQ8_BOUNDS_CACHE[sf_dir] = _sq8.train_bounds(
            _embeddings(spark, sf_dir), "v", DIM
        )
    return _SQ8_BOUNDS_CACHE[sf_dir]


def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN — the 8-bit rung between raw floats
    and the 1-bit sign family (FAISS ``ScalarQuantizer(QT_8bit)``,
    Lucene scalar-quantized KNN).

    Per-dimension corpus (min, max) bounds train in ONE aggregate job
    (2·DIM independent min/max aggs — the DIM-independent-aggs shape,
    never an explode); each component quantizes to a uint8 code
    packed 8-per-long into DIM/8 words; ranking is the centered
    symmetric integer dot product Σ (c_v−128)(c_q−128) with the query
    quantized under the SAME bounds — integer math in whole-stage
    codegen after an IEEE-identical quantization expression, so the
    whole probe is ORACLE-CHECKED (the third exact ANN family next to
    brute force and binary). dim bytes/vector of scan instead of
    8·dim: the committed-layout twin (``ann_sq8_indexed_topk``)
    materializes exactly this 8× cut.

    Recall vs exact cosine is property-tested; the measured M=50
    shortlist recall@10 is 1.0 on this corpus (far above the 1-bit
    signature) — the reason SQ8 is the default committed
    representation in production vector stores.
    """
    e = _embeddings(spark, sf_dir)
    mins, maxs = _sq8_bounds(spark, sf_dir)
    qcodes = _sq8.sq8_codes_py(_query_vector(spark, sf_dir), mins, maxs)
    return (
        e.select("vec_id", *_sq8.sq8_word_cols(F.col("v"), mins, maxs))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("sq8_score", _sq8.adc_score_col(qcodes))
        .orderBy(F.desc("sq8_score"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sq8_score")
    )


def ann_sq8_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQ8 serving loop: integer-ADC top-M shortlist over the
    packed codes, then exact cosine re-rank of the M finalists
    against raw vectors (broadcast semi-join — O(M·DIM) float work
    per query, corpus-size-independent). Both cuts deterministic
    (vec_id tiebreaks), so the COMPOSITION is ORACLE-CHECKED."""
    e = _embeddings(spark, sf_dir)
    mins, maxs = _sq8_bounds(spark, sf_dir)
    qvec = _query_vector(spark, sf_dir)
    qcodes = _sq8.sq8_codes_py(qvec, mins, maxs)
    shortlist = (
        e.select("vec_id", *_sq8.sq8_word_cols(F.col("v"), mins, maxs))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("sq8_score", _sq8.adc_score_col(qcodes))
        .orderBy(F.desc("sq8_score"), F.asc("vec_id"))
        .limit(SQ8_RERANK_M)
        .select("vec_id", "sq8_score")
    )
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = float(np.linalg.norm(qvec))
    return (
        e.join(F.broadcast(shortlist), "vec_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * F.lit(qnorm)), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sq8_score", "cosine")
    )


MRL_PREFIX_DIM = 16
MRL_PREFIX_DIM_2 = 32  # second rung (r08 — tools/mrl_rung_probe.py)
MRL_RERANK_M = 50


def ann_mrl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) prefix-dimension ANN: shortlist on the first
    16 of 64 dimensions, exact full-dimension re-rank — the adaptive-
    retrieval serving shape for nested embeddings (Kusupati et al.,
    "Matryoshka Representation Learning"; the `dimensions` parameter
    of modern embedding APIs).

    Where the quantized families (SQ8/binary/PQ) cut BYTES PER
    COMPONENT, MRL cuts COMPONENTS: the shortlist pass scores
    ``v[0:16]`` cosine — a 4× scan/FLOP cut that needs no codec
    state, no training, no committed sidecar, just a narrower slice
    of the same column (with a column-store layout storing the prefix
    as its own column group, the scan reads exactly those bytes).
    Both cuts are deterministic (rounded score + vec_id tiebreak) and
    every operation is float arithmetic DuckDB reproduces, so the
    composition is ORACLE-CHECKED like the brute-force anchor —
    unlike the trained probes, there is no codec to drift.

    Scale: shortlist is a TakeOrderedAndProject over one pruned scan;
    re-rank rehydrates a constant M=50 vectors via broadcast
    semi-join. On true MRL-trained embeddings the prefix carries most
    of the signal by construction; the recall pytest measures what
    the untrained synthetic corpus gives (the honest lower bound).
    """
    return _mrl_topk(spark, sf_dir, MRL_PREFIX_DIM)


def ann_mrl32_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND Matryoshka rung: prefix-32 shortlist, exact full-dim
    re-rank — the middle entry of the adaptive-retrieval ladder
    (16 → 32 → full), same composition and oracle family as
    ``ann_mrl_topk`` with a 2× scan cut instead of 4×.

    Added on MEASURED evidence (tools/mrl_rung_probe.py, r08): on
    this corpus the 32-rung's shortlist recall roughly DOUBLES the
    16-rung's (sf0.01 raw 0.46 → 0.71, sf0.1 raw 0.24 → 0.54;
    PCA-rotated 0.69 → 0.91 / 0.36 → 0.67), so the two rungs occupy
    genuinely different recall/cost points — the separation the r07
    verdict required before registering this key. The per-rung
    recall is served as rows of ``ann_recall_curve``.
    """
    return _mrl_topk(spark, sf_dir, MRL_PREFIX_DIM_2)


def _mrl_topk(spark: SparkSession, sf_dir: str, prefix_dim: int) -> DataFrame:
    """Shared MRL serving composition: prefix-``prefix_dim`` cosine
    shortlist (M=50, rounded score + vec_id tiebreak), exact full-dim
    re-rank over a broadcast of the finalists."""
    e = _embeddings(spark, sf_dir)
    qvec = _query_vector(spark, sf_dir)
    qpre = qvec[:prefix_dim]
    qpre_col = F.array(*[F.lit(float(x)) for x in qpre])
    qpre_norm = float(np.linalg.norm(qpre))
    vpre = F.slice(F.col("v"), 1, prefix_dim)
    shortlist = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn(
            "prefix_cosine",
            F.round(
                _dot(vpre, qpre_col) / (_norm(vpre) * F.lit(qpre_norm)), 6
            ),
        )
        .orderBy(F.desc("prefix_cosine"), F.asc("vec_id"))
        .limit(MRL_RERANK_M)
        .select("vec_id", "prefix_cosine")
    )
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = float(np.linalg.norm(qvec))
    return (
        e.join(F.broadcast(shortlist), "vec_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * F.lit(qnorm)), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "prefix_cosine", "cosine")
    )


def _mrl_index(spark: SparkSession, sf_dir: str) -> str:
    """The committed MRL-prefix-bearing IVF layout (built once per
    corpus, snapshot-committed so probes resolve a manifest): stores
    ``v_pre = v[0:16]`` as its own parquet column next to each
    vector."""
    from . import ann_index

    idx = ann_index.build_ivf_index(
        spark, sf_dir, IVF_NLIST, mrl_dim=MRL_PREFIX_DIM
    )
    corpus = f"{idx}/corpus"
    if not ann_index.read_index_manifest(corpus)["files"]:
        ann_index.commit_index_snapshot(corpus)
    return idx


def ann_mrl_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_mrl_topk`` served from the COMMITTED layout: the prefix
    shortlist reads the materialized ``v_pre`` column (16 of 64
    doubles per vector — parquet column pruning makes the 4×
    component cut literal bytes) of a manifest-resolved snapshot; the
    raw vector column never enters the shortlist's read schema
    (plan-asserted). Exact full-dim re-rank rehydrates the constant
    M=50 finalists. Prefixes are DERIVED columns
    (``ann_index._derived_col_map``) recomputed from ``v`` by every
    write path, so they stay exact through append/upsert/rebalance/
    CDC like the signature and SQ8 words. ORACLE-CHECKED with the
    SAME oracle as the in-scan key — materialization must not change
    one result row.
    """
    from . import ann_index

    idx = _mrl_index(spark, sf_dir)
    qvec = _query_vector(spark, sf_dir)
    shortlist = (
        ann_index.probe_mrl_snapshot(
            spark, idx, [float(x) for x in qvec[:MRL_PREFIX_DIM]]
        )
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.desc("prefix_cosine"), F.asc("vec_id"))
        .limit(MRL_RERANK_M)
        .select("vec_id", "prefix_cosine")
    )
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = float(np.linalg.norm(qvec))
    return (
        _embeddings(spark, sf_dir)
        .join(F.broadcast(shortlist), "vec_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * F.lit(qnorm)), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "prefix_cosine", "cosine")
    )


def ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantization-rung decision table: recall@10 of each
    compressed ANN ranking (1-bit binary / 8-bit SQ8 / 16-of-64-dim
    MRL prefix) against the exact cosine top-10 — the measurement a
    serving tier runs before choosing how many bytes per vector to
    commit (the `embedding_knn_eval` discipline, pointed at the
    index families instead of the embedding space).

    One row per method with the hit count and ppm recall (integer
    division over exact counts). Every constituent ranking already
    has an exact DuckDB twin, so the WHOLE table is ORACLE-CHECKED —
    this is the rare eval where the answer itself is hash-pinned, not
    a property bound. Cost: the three method scans the individual
    keys run, plus 10-row joins.
    """
    exact = ann_bruteforce_topk(spark, sf_dir).select("vec_id")
    methods = [
        ("binary", ann_binary_topk),
        ("mrl", ann_mrl_topk),
        ("mrl32", ann_mrl32_topk),  # r08: second rung (probe-justified)
        ("sq8", ann_sq8_topk),
    ]
    out = None
    for name, fn in methods:
        hits = (
            fn(spark, sf_dir)
            .select("vec_id")
            .join(exact, "vec_id", "left_semi")
        )
        row = hits.agg(
            F.count(F.lit(1)).cast("long").alias("n_hits")
        ).select(
            F.lit(name).alias("method"),
            "n_hits",
            F.expr(f"(1000000 * n_hits) div {TOP_K}")
            .cast("long")
            .alias("recall_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sq8_index(
    spark: SparkSession, sf_dir: str, attrs: tuple[str, ...] = ()
) -> str:
    """The committed SQ8-code-bearing IVF layout (built once per
    corpus, snapshot-committed so probes resolve a manifest): frozen
    per-dim bounds in ``_SQ8.json``, packed code words next to each
    vector (+ any filtered-search attrs)."""
    from . import ann_index

    idx = ann_index.build_ivf_index(
        spark, sf_dir, IVF_NLIST, attrs=attrs, sq8=True
    )
    corpus = f"{idx}/corpus"
    if not ann_index.read_index_manifest(corpus)["files"]:
        ann_index.commit_index_snapshot(corpus)
    return idx


def ann_sq8_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_sq8_topk`` served from the COMMITTED index layout: the
    integer-ADC scan reads the materialized code words (DIM bytes per
    vector) of a manifest-resolved snapshot — the raw vector column
    never enters the read schema (plan-asserted), and the query is
    quantized under the layout's FROZEN bounds (``read_sq8_meta``),
    not retrained. Codes stay exact through append/upsert/rebalance
    (derived-column recompute in ``ann_index``; frozen-codec clamp
    pytest-pinned). Integer-exact end-to-end, hence ORACLE-CHECKED —
    same oracle as the in-scan key, because materialization must not
    change a single result row."""
    from . import ann_index

    idx = _sq8_index(spark, sf_dir)
    meta = ann_index.read_sq8_meta(idx)
    qcodes = _sq8.sq8_codes_py(
        _query_vector(spark, sf_dir), meta["mins"], meta["maxs"]
    )
    return (
        ann_index.probe_sq8_snapshot(spark, idx, qcodes)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.desc("sq8_score"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sq8_score")
    )


def ann_filtered_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED SQ8 ANN over the committed layout — the same
    production serving shape as ``ann_filtered_binary_topk`` at the
    8-bit rung:

    1. label equality pushed to the parquet reader INSIDE the pruned
       code scan (top-k over the FILTERED candidate set, never a
       post-filter of an unfiltered top-k);
    2. integer-ADC top-``SQ8_RERANK_M`` shortlist over the packed
       words under the layout's FROZEN bounds (vec_id tiebreak);
    3. exact cosine re-rank of the finalists (broadcast semi-join).

    Every cut integer- or round(6)-deterministic → the COMPOSED probe
    is ORACLE-CHECKED at both SFs. With both quantized families
    filtered, a serving tier can trade scan bytes for shortlist
    fidelity (16 B/vector Hamming vs 64 B/vector ADC) behind the same
    probe contract.
    """
    from . import ann_index

    idx = _sq8_index(spark, sf_dir, attrs=("label",))
    meta = ann_index.read_sq8_meta(idx)
    qvec = _query_vector(spark, sf_dir)
    qcodes = _sq8.sq8_codes_py(qvec, meta["mins"], meta["maxs"])
    shortlist = (
        ann_index.probe_sq8_snapshot(
            spark, idx, qcodes, where=F.col("label") == FILTER_LABEL
        )
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.desc("sq8_score"), F.asc("vec_id"))
        .limit(SQ8_RERANK_M)
        .select("vec_id", "sq8_score")
    )
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = float(np.linalg.norm(qvec))
    return (
        _embeddings(spark, sf_dir)
        .join(F.broadcast(shortlist), "vec_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * F.lit(qnorm)), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "sq8_score", "cosine")
    )


def hybrid_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval SERVED FROM THE COMMITTED
    LAYOUTS — the index-side twin of ``retrieval.hybrid_search``,
    which builds its lexical list from the corpus-scan BM25 and its
    vector list from a full exact-cosine scan. This is the
    composition a RAG/search serving tier actually runs: neither leg
    touches corpus text or raw-vector bytes beyond a constant-size
    rerank.

    - lexical: ``bm25_wand_topk`` over the tiered BM25 posting layout
      (impact-bound two-phase probe — the rare term's list read
      whole, common terms' low tiers θ-pruned; telemetry in
      ``bm25_wand_topk.last_stats``), top-20 by (bm25 DESC, doc_id);
    - vector: integer-ADC top-``SQ8_RERANK_M`` shortlist over the
      committed SQ8 code words (manifest-resolved snapshot, frozen
      bounds — DIM bytes/vector, the raw ``v`` column never in the
      shortlist read schema), then exact cosine re-rank of the M
      finalists rehydrated FROM THE SAME SNAPSHOT (broadcast
      semi-join — O(M·DIM) float work; the embeddings base table is
      never read), top-20 by (cosine DESC, vec_id);
    - fusion: reciprocal rank fusion, score = Σ 1/(60 + rank) —
      rank-only, so the incomparable score scales need no
      calibration (Cormack et al. 2009), identical discipline and
      output contract to ``hybrid_search``.

    ORACLE-CHECKED end to end: both constituent rankings are exact
    (the WAND bound is admissible under the 4-dp rounding grid; the
    SQ8 quantization expression is IEEE-identical cross-engine), and
    rank fusion over two exact 20-row lists is integer arithmetic —
    the DuckDB twin replays both legs from first principles and
    fuses with the same rounding.

    Scale: the lexical leg reads tier-pruned posting blocks, the
    vector leg reads code words at DIM bytes/vector plus exactly M
    raw vectors; the fusion joins two 20-row frames. Per-query cost
    is index-sized on both legs — the last serving path in the repo
    whose hot loop read the corpus is closed.

    Reference contract: StreamTableJoinExample's enrich-at-query-time
    shape (reference src/main/java/samza/examples/cookbook/
    StreamTableJoinExample.java) composed over both retrieval
    modalities.
    """
    from ..sources.inverted import WAND_QUERY_TERMS, _documents_bm25_index

    return hybrid_topk_from_layouts(
        spark,
        _documents_bm25_index(spark, sf_dir),
        _sq8_index(spark, sf_dir),
        WAND_QUERY_TERMS,
        _query_vector(spark, sf_dir),
        exclude_vec_id=QUERY_VEC_ID,
    )


def hybrid_topk_from_layouts(
    spark: SparkSession,
    bm25_index_dir: str,
    sq8_index_dir: str,
    terms,
    qvec: np.ndarray,
    exclude_vec_id: int | None = None,
    attr_eq: tuple[str, object] | None = None,
    man: dict | None = None,
) -> DataFrame:
    """ONE hybrid query against committed layouts — the shared core of
    ``hybrid_search_indexed`` / ``hybrid_filtered_indexed`` and the
    per-micro-batch unit of ``streaming.maintenance
    .hybrid_serving_job`` (r11): because batch keys and the streaming
    tier call THIS function, batch-parity is structural, not
    coincidental. ``man`` pins the vector snapshot (a serving batch
    resolves it once so every query in the batch reads one committed
    version); ``attr_eq`` applies the metadata predicate pre-cut on
    both legs."""
    from pyspark.sql import Window

    from ..sources.inverted import bm25_wand_topk
    from .retrieval import BM25_TOP, HYBRID_TOP, RRF_K
    from . import ann_index

    lex = (
        bm25_wand_topk(
            spark, bm25_index_dir, list(terms), BM25_TOP, attr_eq=attr_eq
        )
        .select("doc_id", "bm25")
        .withColumn(
            "lex_rank",
            F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
        )
    )

    meta = ann_index.read_sq8_meta(sq8_index_dir)
    qcodes = _sq8.sq8_codes_py(qvec, meta["mins"], meta["maxs"])
    corpus_dir = f"{sq8_index_dir}/corpus"
    man_supplied = man is not None
    if man is None:
        man = ann_index.read_index_manifest(corpus_dir)
    # serving round-trip telemetry (r11, VERDICT r10 #6): a repeated
    # hybrid probe should execute ONLY the WAND accumulator/candidate
    # actions plus the lazy final plan — pricing, query vector, codec
    # meta, and manifest all serve from restart-safe plain-data caches.
    from ..sources.inverted import bm25_wand_topk as _wand

    hybrid_topk_from_layouts.last_stats = {
        "wand_round_trips": _wand.last_stats.get("n_round_trips"),
        "wand_pricing_cached": _wand.last_stats.get("pricing_cached"),
        "sq8_meta_cached": ann_index.read_sq8_meta.last_cached,
        "manifest_cached": (
            True if man_supplied else ann_index.read_index_manifest.last_cached
        ),
    }
    where = None if attr_eq is None else (F.col(attr_eq[0]) == F.lit(attr_eq[1]))
    shortlist = ann_index.probe_sq8_snapshot(
        spark, sq8_index_dir, qcodes, where=where, man=man
    )
    if exclude_vec_id is not None:
        shortlist = shortlist.filter(F.col("vec_id") != exclude_vec_id)
    shortlist = (
        shortlist.orderBy(F.desc("sq8_score"), F.asc("vec_id"))
        .limit(SQ8_RERANK_M)
        .select("vec_id")
    )
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    qnorm = float(np.linalg.norm(qvec))
    # rehydrate the M finalists from the SAME snapshot (tombstone-
    # consistent by construction: the shortlist is already masked)
    vec = (
        ann_index.snapshot_scan(spark, corpus_dir, man=man)
        .select("vec_id", "v")
        .join(F.broadcast(shortlist), "vec_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * F.lit(qnorm)), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(BM25_TOP)
        .select(F.col("vec_id").alias("doc_id"), "cosine")
        .withColumn(
            "vec_rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
            ),
        )
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(-1)).cast("long").alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(-1)).cast("long").alias("vec_rank"),
        F.coalesce("bm25", F.lit(0.0)).alias("bm25"),
        F.coalesce("cosine", F.lit(0.0)).alias("cosine"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(HYBRID_TOP)


def hybrid_filtered_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED hybrid retrieval served from committed layouts — the
    production RAG shape "top-k among docs where label = L", with the
    metadata predicate applied BEFORE the cut on BOTH legs (VERDICT
    r10 #2). A post-filter of unfiltered top-k lists under-fills and
    mis-ranks; this ranks the filtered universe on each modality:

    - lexical: ``bm25_wand_topk(attr_eq=("label", FILTER_LABEL))``
      over the ATTRIBUTE-BEARING posting layout
      (``_documents_bm25_label_index`` — label denormalized onto
      every posting row at build time, so the equality pushes to the
      posting parquet scan, and the ``_impacts`` sidecar is
      SEGMENTED per label). The filter rides every read: phase 1
      (θ becomes the k-th best partial among ALLOWED docs), phase 2
      completion, and the fallback — a filtered-out doc can never be
      resurrected. Pricing reads the label's own sidecar segment:
      bounds/slack are maxima over the allowed subset (admissible for
      it, and tight enough to actually beat the filtered θ), and
      blocks holding no allowed posting leave the read set entirely —
      so the filtered top-k is EXACT and still block-skips; scores
      are unchanged from the unfiltered probe (df summed across
      segments — the Lucene filter contract).
    - vector: ``ann_filtered_sq8_topk``'s serving shape on the
      attr-bearing SQ8 layout — label equality pushed inside the
      committed code-word scan, integer-ADC top-``SQ8_RERANK_M``
      over the FILTERED candidates, then exact cosine re-rank of the
      finalists rehydrated FROM THE SAME SNAPSHOT (broadcast
      semi-join; the embeddings base table never enters the plan).
    - fusion: the same rank-only RRF as ``hybrid_search_indexed``
      (both legs rank the SAME filtered universe, so fused ranks are
      label-consistent by construction).

    ORACLE-CHECKED end to end at both SFs: both filtered rankings
    are exact (admissible bound on the filtered subset; integer ADC),
    and the DuckDB twin replays each from first principles with the
    label restriction applied pre-cut.

    Scale: identical to the unfiltered serving path — tier-pruned
    posting blocks and DIM-byte code words, now with a pushed
    attribute equality shrinking both reads further; selectivity
    costs nothing extra because the filter is a scan predicate, not
    a join. Reference contract: StreamTableJoinExample's
    enrich-at-query-time shape restricted to a profile segment."""
    from ..sources.inverted import (
        WAND_QUERY_TERMS,
        _documents_bm25_label_index,
    )

    return hybrid_topk_from_layouts(
        spark,
        _documents_bm25_label_index(spark, sf_dir),
        _sq8_index(spark, sf_dir, attrs=("label",)),
        WAND_QUERY_TERMS,
        _query_vector(spark, sf_dir),
        exclude_vec_id=QUERY_VEC_ID,
        attr_eq=("label", FILTER_LABEL),
    )


#: kNN-eval geometry: queries, neighbourhood size.
KNN_EVAL_Q = 10
KNN_EVAL_K = 10


def embedding_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the embedding space — the
    metric report a training-data pipeline runs before trusting an
    embedding column for dedup/search: for each query vector, does
    exact cosine top-k retrieve SAME-LABEL neighbours?

    Per query (vec_id < Q): hits@k (same-label neighbours in the
    top-k), and MRR as micro-units (10⁶ div first-hit rank — INTEGER
    division, so the metric is oracle-exact; 0 = no hit). The ranking
    is the ``ann_batch_topk`` plan shape: ONE corpus scan scores all Q
    broadcast queries, per-query row_number windows cut the top-k —
    nothing funnels through a single partition, and eval cost is one
    scan regardless of Q. Ground truth (label) rides the same scan.

    This is the harness that turns "the ANN family has recall
    pytests" into a COMMITTED, hash-checked corpus-quality artifact —
    the same committed-evidence discipline as
    ``quantile_kmv_calibration``.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < KNN_EVAL_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qnorm"),
    )
    from pyspark.sql import Window

    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (_norm(F.col("v")) * F.col("qnorm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KNN_EVAL_K
    )
    return topk.groupBy("query_id", "qlabel").agg(
        F.sum((F.col("label") == F.col("qlabel")).cast("long")).alias("hits_at_k"),
        # reciprocal rank of the FIRST hit = max over hits (10⁶ div rn
        # is decreasing in rn, so the best rank wins the max)
        F.coalesce(
            F.max(
                F.when(
                    F.col("label") == F.col("qlabel"),
                    F.expr("CAST(1000000 AS BIGINT) div rn"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("mrr_micro"),
    )


N_BATCH_QUERIES = 5
BATCH_TOP_K = 5


def _spread_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin the committed-code scan across every core before a
    broadcast query fanout (guide §2.4 — stragglers/parallelism): the
    snapshot's ``list_id`` layout yields ONE task per parquet file (16
    at bench scale on 32 cores) and IVF lists are size-skewed, so the
    |codes|·|queries| scoring stage ran at half parallelism with a
    straggling hot list (profiled: 20.9 s of a 27.6 s key in one
    16-task stage). The codes relation is DIM bytes/vector, so this
    exchange is tiny next to the scoring stage it feeds; when the scan
    already has ≥ cores partitions (the 100 TB layout) it is a no-op.
    Scale-adaptive by construction: the target is the session's
    defaultParallelism, never a constant."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN: top-5 neighbors for each of 5 query vectors at once.

    The realistic serving shape — queries broadcast as one small
    relation, the corpus is scanned ONCE for all of them, and the
    per-query top-k is a row_number window *partitioned by query id*
    (each query ranks independently; nothing funnels through a single
    partition, unlike one global ORDER BY).
    """
    e = _embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qnorm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qnorm")), 6
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BATCH_TOP_K)
        .select("query_id", "vec_id", "cosine")
    )


def ann_sq8_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ADC retrieval over the COMMITTED SQ8 code layout —
    ``ann_batch_topk``'s serving shape at the 8-bit rung, and the
    vector sibling of ``bm25_batch_indexed``: offline retrieval
    (training-data curation, eval-set mining, hard-negative sweeps)
    runs queries in batches, and the scan that dominates is the code
    read — so the corpus code words are scanned ONCE for all
    ``N_BATCH_QUERIES`` queries, scored per Arrow batch as one exact
    integer GEMM with in-kernel partial top-k
    (``functions/sq8.adc_batch_candidates`` — guide §4.2), and the
    per-query top-k is a row_number window over the bounded
    candidate set, partitioned by query_id.

    Exactness: every query is quantized under the layout's FROZEN
    bounds (``read_sq8_meta``) with the same IEEE-identical
    expression order as the stored codes, and the centered symmetric
    integer score is pure integer math — the whole batch is
    ORACLE-CHECKED like the single-query SQ8 keys (the fourth member
    of the exact-ANN batch story next to brute force).

    Scale: DIM bytes/vector of snapshot code scan (the raw ``v``
    column never enters the read schema — plan-asserted), one scan
    amortized over the batch, per-query skew bounded by the window's
    query_id partitioning — the same argument as the lexical batch
    keys, at vector width.
    """
    from . import ann_index

    idx = _sq8_index(spark, sf_dir)
    meta = ann_index.read_sq8_meta(idx)
    corpus_dir = f"{idx}/corpus"
    man = ann_index.read_index_manifest(corpus_dir)
    e = _embeddings(spark, sf_dir)
    qrows = e.filter(F.col("vec_id") < N_BATCH_QUERIES).collect()  # bounded
    qcands = [
        (
            int(r.vec_id),
            _sq8.sq8_codes_py(np.asarray(r.v), meta["mins"], meta["maxs"]),
        )
        for r in qrows
    ]
    codes = (
        ann_index.snapshot_scan(spark, corpus_dir, man=man)
        .select("vec_id", *meta["sq8_cols"])
    )
    codes = ann_index._apply_tombstones(
        spark, idx, codes, tomb_files=man.get("tombstones")
    )
    codes = _spread_scan(spark, codes)
    from pyspark.sql import Window

    # r11 kernel swap (guide §4.2): the |codes|·|queries| scoring is
    # one exact GEMM per Arrow batch with in-kernel per-batch top-k;
    # the window ranks the bounded candidate set — same rows, same
    # order, same hash (equivalence pinned in test_sq8_index.py).
    cand = _sq8.adc_batch_candidates(
        codes, meta["dim"], qcands, BATCH_TOP_K
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sq8_score"), F.asc("vec_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BATCH_TOP_K)
        .select("query_id", "vec_id", "sq8_score")
    )


#: vector-batch width at "real" query volume — matches the lexical
#: wide batch (inverted.WIDE_QUERIES) so the two modalities' fanout
#: evidence is comparable.
WIDE_VEC_QUERIES = 240


def _wide_vec_ids(n_vectors: int) -> list[int]:
    """The pinned integer query generator for the wide vector batch:
    ``WIDE_VEC_QUERIES`` vec_ids stepped uniformly across the id range
    (ids are contiguous 0..N-1 in this corpus family) — deterministic,
    SQL-expressible (the DuckDB twin derives the identical set from
    count(*)), and spread so queries do not cluster in one IVF cell."""
    if n_vectors <= 0:
        return []
    step = max(1, n_vectors // WIDE_VEC_QUERIES)
    return [i * step for i in range(min(WIDE_VEC_QUERIES, n_vectors))]


def ann_sq8_batch_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ADC retrieval at REAL query volume (r11, VERDICT r10 #4)
    — ``ann_sq8_batch_topk``'s plan at 240 queries, the vector twin
    of ``bm25_batch_wide``: the lexical side proved the per-query
    window fanout holds at 48× the pinned batch; this proves it at
    vector width. ONE committed-code scan (DIM bytes/vector, raw
    ``v`` never in the read schema) scores every query via one exact
    GEMM per Arrow batch with in-kernel partial top-k
    (``adc_batch_candidates`` — guide §4.2), per-query top-k by a
    query_id-partitioned row_number window over the candidates.
    The query set is the pinned stepped-id generator
    (``_wide_vec_ids``) quantized under the layout's FROZEN bounds.

    Integer-exact end to end, so the WHOLE 240-query batch is
    ORACLE-CHECKED — the scale-evidence twin of the r09 lexical wide
    batch, with the fanout measured in SCALING.md.

    Scale: scan cost is the code read ONCE regardless of batch width;
    the scored relation grows ∝ queries x corpus but never
    materializes beyond the window's per-partition top-k state;
    per-query skew is bounded by the window's query_id partitioning.
    The driver holds 240 query codes — K·DIM bytes."""
    from pyspark.sql import Window

    from . import ann_index

    idx = _sq8_index(spark, sf_dir)
    meta = ann_index.read_sq8_meta(idx)
    corpus_dir = f"{idx}/corpus"
    man = ann_index.read_index_manifest(corpus_dir)
    e = _embeddings(spark, sf_dir)
    n = e.count()
    ids = _wide_vec_ids(n)
    qrows = e.filter(F.col("vec_id").isin(ids)).collect()  # 240-row bound
    qcands = [
        (
            int(r.vec_id),
            _sq8.sq8_codes_py(np.asarray(r.v), meta["mins"], meta["maxs"]),
        )
        for r in qrows
    ]
    codes = (
        ann_index.snapshot_scan(spark, corpus_dir, man=man)
        .select("vec_id", *meta["sq8_cols"])
    )
    codes = ann_index._apply_tombstones(
        spark, idx, codes, tomb_files=man.get("tombstones")
    )
    codes = _spread_scan(spark, codes)
    # r11 kernel swap (guide §4.2): 240-query GEMM scoring with
    # in-kernel partial top-k — the 27 s JVM per-pair scoring stage
    # (tools/adc_ab_probe.py, 10× tier) becomes one exact matrix
    # product per Arrow batch; rows/order/hash unchanged.
    cand = _sq8.adc_batch_candidates(
        codes, meta["dim"], qcands, BATCH_TOP_K
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sq8_score"), F.asc("vec_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BATCH_TOP_K)
        .select("query_id", "vec_id", "sq8_score")
    )


def hybrid_batch_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval AT QUERY VOLUME from the committed layouts —
    the batch composition of ``hybrid_search_indexed``: five hybrid
    queries (query_id 0..4), each pairing a pinned lexical term query
    (``BM25_BATCH_QUERIES[i]``) with an embedding query (vec_id i),
    RRF-fused per query. This is the offline serving shape a RAG
    curation/eval pipeline runs: batches of multimodal queries, one
    pruned read per modality for the WHOLE batch.

    - lexical: ``bm25_batch_wand_topk`` — per-query impact-bound
      routing over the tiered posting layout (ONE phase-1 tier read
      for the union terms), top-``BM25_BATCH_TOP`` per query;
    - vector: ONE committed-code scan scores all queries
      (``adc_batch_candidates`` GEMM kernel), per-query ADC
      top-``SQ8_RERANK_M``
      shortlist, exact cosine re-rank of the finalists rehydrated
      from the SAME snapshot against each query's raw vector
      (broadcast 5-row query relation), top-``BM25_BATCH_TOP``;
    - fusion: RRF k=60 per (query_id, doc_id), top-``HYBRID_TOP`` per
      query — rank-only, both leg scores exact, so the WHOLE batch is
      ORACLE-CHECKED (the DuckDB twin replays both batch programs and
      fuses with identical rounding).

    Scale: two batch-amortized pruned scans + windows partitioned by
    query_id; neither corpus base table is read (plan-asserted on the
    single-query twin; same read paths here).
    """
    from pyspark.sql import Window

    from ..sources.inverted import (
        BM25_BATCH_QUERIES,
        BM25_BATCH_TOP,
        _documents_bm25_index,
        bm25_batch_wand_topk,
    )
    from .retrieval import HYBRID_TOP, RRF_K
    from . import ann_index

    lex = bm25_batch_wand_topk(
        spark,
        _documents_bm25_index(spark, sf_dir),
        BM25_BATCH_QUERIES,
        BM25_BATCH_TOP,
    ).select("query_id", "doc_id", "bm25")
    wl = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex.withColumn("lex_rank", F.row_number().over(wl))

    idx = _sq8_index(spark, sf_dir)
    meta = ann_index.read_sq8_meta(idx)
    corpus_dir = f"{idx}/corpus"
    man = ann_index.read_index_manifest(corpus_dir)
    e = _embeddings(spark, sf_dir)
    qrows = e.filter(F.col("vec_id") < N_BATCH_QUERIES).collect()  # bounded
    qrel = spark.createDataFrame(
        [
            (
                int(r.vec_id),
                [float(x) for x in r.v],
                float(np.linalg.norm(np.asarray(r.v))),
            )
            for r in qrows
        ],
        "query_id LONG, qv ARRAY<DOUBLE>, qnorm DOUBLE",
    )
    qcands = [
        (
            int(r.vec_id),
            _sq8.sq8_codes_py(np.asarray(r.v), meta["mins"], meta["maxs"]),
        )
        for r in qrows
    ]
    codes = ann_index.snapshot_scan(spark, corpus_dir, man=man).select(
        "vec_id", *meta["sq8_cols"]
    )
    codes = ann_index._apply_tombstones(
        spark, idx, codes, tomb_files=man.get("tombstones")
    )
    codes = _spread_scan(spark, codes)
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("sq8_score"), F.asc("vec_id")
    )
    # r11 kernel swap (guide §4.2): GEMM candidates + window replace
    # the per-pair JVM scoring; same shortlist set, pinned by the
    # unchanged oracle hash.
    shortlist = (
        _sq8.adc_batch_candidates(codes, meta["dim"], qcands, SQ8_RERANK_M)
        .withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= SQ8_RERANK_M)
        .select("query_id", "vec_id")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("doc_id")
    )
    vec = (
        ann_index.snapshot_scan(spark, corpus_dir, man=man)
        .select("vec_id", "v")
        .join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(qrel.select("query_id", "qv", "qnorm")), "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (_norm(F.col("v")) * F.col("qnorm")),
                6,
            ),
        )
        .select("query_id", F.col("vec_id").alias("doc_id"), "cosine")
        .withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= BM25_BATCH_TOP)
    )
    fused = lex.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.coalesce("lex_rank", F.lit(-1)).cast("long").alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(-1)).cast("long").alias("vec_rank"),
        F.coalesce("bm25", F.lit(0.0)).alias("bm25"),
        F.coalesce("cosine", F.lit(0.0)).alias("cosine"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= HYBRID_TOP)
        .select(
            "query_id", "doc_id", "lex_rank", "vec_rank", "bm25", "cosine", "rrf"
        )
    )


#: same near-dup threshold as dedup_embedding — this operator is its
#: cluster-scoped scale path.
SEM_TAU = 0.45


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the MATERIALIZED IVF layout.

    ``dedup_embedding`` is the all-pairs calibration baseline; this is
    the scale path (the SemDeDup recipe — Abbas et al. 2023, public):
    coarse-cluster the corpus (the IVF index already stores it
    ``partitionBy(list_id)``), then compare pairs ONLY within a
    cluster — the join is an equi-join on ``list_id``, so pair cost is
    Σ|list|², never corpus². A vector is dropped when some lower-id
    vector in its list has cosine ≥ τ; its ``keeper`` is the smallest
    such id (chain semantics like dedup_exact's canonical — a keeper
    may itself be dropped in favor of an even lower id).

    Rows-only (float cosine near τ isn't bit-stable across engines);
    the drop-implies-similar-keeper property and the baseline-subset
    relation are pytest-asserted.
    """
    from . import ann_index

    idx = ann_index.build_ivf_index(spark, sf_dir, IVF_NLIST)
    import os

    corpus = spark.read.parquet(os.path.join(idx, "corpus")).select(
        "list_id", "vec_id", "v", _norm(F.col("v")).alias("norm")
    )
    a = corpus.alias("a")
    b = corpus.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(
            b,
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cosine", F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6))
        .filter(F.col("cosine") >= SEM_TAU)
    )
    return (
        pairs.groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(
            F.min(F.col("a.vec_id")).alias("keeper_vec_id"),
            F.count(F.lit(1)).cast("long").alias("n_similar"),
        )
    )


PCA_K = 8


def _pca_gram_folded(e: DataFrame) -> DataFrame:
    """Per-Arrow-batch (n | Σx | XᵀX) partials, tree-reduced JVM-side.

    Each batch collapses to ONE packed vector row inside
    ``mapInPandas``; posexplode + positional sum then folds them with
    map-side partial aggregation, so the driver collects EXACTLY
    1 + DIM + DIM² rows regardless of corpus size (at 100 TB the raw
    per-batch rows alone would be millions of (DIM²+DIM)-double rows
    through the driver)."""

    def partial_gram(batches):
        for pdf in batches:
            mat = np.stack(pdf["v"].to_numpy())
            flat = np.concatenate(
                ([float(len(mat))], mat.sum(axis=0), (mat.T @ mat).ravel())
            )
            yield pd.DataFrame({"p": [flat.tolist()]})

    return (
        e.select("v")
        .mapInPandas(partial_gram, "p array<double>")
        .select(F.posexplode("p").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("x"))
    )


def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project embeddings onto their top-8 principal components.

    The scalable PCA shape (what MLlib's RowMatrix does under the
    hood): the DIM×DIM Gramian and column sums are accumulated
    per-Arrow-batch with numpy matmuls inside ``mapInPandas`` — each
    batch collapses to ONE packed (n | Σx | XᵀX) row — then
    tree-reduced JVM-side (posexplode + positional sum with map-side
    partial aggregation) so the driver collects a CONSTANT
    1 + DIM + DIM² values regardless of corpus size. The
    64×64 covariance eigendecomposition is a driver-side numpy
    ``eigh`` (trivial at any corpus scale — the matrix only depends
    on DIM), and the projection is one more Arrow-batched pass with
    the component matrix shipped as a closure constant.

    Deterministic: eigh on identical covariance bits, eigenvector
    sign fixed by making each component's largest-|coefficient| entry
    positive. Rows-only (eigendecomposition isn't SQL-expressible);
    variance/orthogonality/reconstruction properties are pytest-
    asserted against a straight numpy PCA of the same table.
    """
    e = _embeddings(spark, sf_dir)
    vec = np.zeros(1 + DIM + DIM * DIM)
    for r in _pca_gram_folded(e).collect():
        vec[r.i] = r.x
    n = int(vec[0])
    s = vec[1 : 1 + DIM]
    gram = vec[1 + DIM :].reshape(DIM, DIM)
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:PCA_K]
    comps = eigvecs[:, order]  # (DIM, K)
    for k in range(PCA_K):  # sign convention: dominant coefficient > 0
        j = int(np.argmax(np.abs(comps[:, k])))
        if comps[j, k] < 0:
            comps[:, k] = -comps[:, k]

    from pyspark.sql.types import ArrayType, DoubleType

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        proj = np.round((mat - mean) @ comps, 6)
        return pd.Series(list(proj))

    return e.select("vec_id", project(F.col("v")).alias("components"))


N_ANCHORS = 5
HARD_NEG_K = 5


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hard negatives per anchor: most-similar OTHER-label vectors.

    The contrastive-training data op: for each anchor, the negatives
    that matter are the ones the current embedding space finds most
    similar despite carrying a different label. Plan shape is
    ann_batch_topk's — anchors (with labels) broadcast, ONE corpus
    scan scores all of them, per-anchor top-k via a window partitioned
    by anchor — plus the label-mismatch predicate pushed into the
    scored stream before ranking. At serving scale the same query runs
    against the IVF/PQ index instead of the raw corpus; this is the
    exact-scoring definition the index variants are measured against.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    anchors = e.filter(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qnorm"),
    )
    scored = (
        e.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("anchor_label"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qnorm")), 6
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HARD_NEG_K)
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            "cosine",
        )
    )


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class centroids), long form.

    The array mean is DIM independent ``avg()`` aggregates — partial
    sums combine map-side and one narrow shuffle moves (label, 64
    doubles) per partition. Exploding first (the naive plan) would
    inflate the shuffle ×DIM with one row per element. The post-agg
    posexplode touches only n_labels rows. Output (label, dim, val)
    is the join-friendly shape for centroid-lookup scoring.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = e.groupBy("label").agg(
        *[
            F.round(F.avg(F.col("v").getItem(i)), 6).alias(f"c{i}")
            for i in range(DIM)
        ]
    )
    return cents.select(
        "label",
        F.posexplode(F.array(*[F.col(f"c{i}") for i in range(DIM)])).alias(
            "dim", "val"
        ),
    ).select("label", F.col("dim").cast("int").alias("dim"), "val")


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-norm distribution per label (embedding QA companion).

    Un-normalized or collapsed embedding batches show up as norm
    outlier groups before anything else does. The norm is the JVM
    index-ordered fold (identical order to the oracle's
    list_transform + list_sum), rounded BEFORE the per-label stats so
    both engines aggregate identical doubles; exact percentiles over
    the bounded label keyspace.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    norms = e.select("label", F.round(_norm(F.col("v")), 6).alias("nrm"))
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("nrm"), 4).alias("mean_norm"),
        F.round(F.percentile("nrm", 0.5), 6).alias("p50_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization audit.

    The serving-memory lever between float32 and PQ: scalar int8
    (scale = max|v_i|/127, q_i = half-up(v_i/scale)) is 4× smaller
    with near-lossless recall, and every vector DB ships it. This
    operator reports what that compression would cost HERE: per-vector
    scale, max absolute reconstruction error, and relative L2 error —
    the audit you run before flipping a corpus to int8.

    Engine-exactness: quantized codes use floor(x·127/maxabs + 0.5)
    — explicit half-up built from floor, which IS exact in IEEE
    arithmetic on identical doubles — rather than each engine's own
    round() (they disagree on exact halves). maxabs is an
    order-independent max fold. Error sums fold per-row in index
    order on both engines (the embedding_outliers discipline) and are
    rounded to 6dp. Zero vectors quantize to scale 0 / error 0.

    Scale shape: one scan, zero shuffle — all math is per-row JVM
    higher-order functions; output is corpus-sized but 4 narrow
    columns. The actual rewrite (writing q codes) is this plan plus a
    partitioned write.
    """
    e = _embeddings(spark, sf_dir)
    with_max = e.select(
        "vec_id",
        "v",
        F.aggregate(
            "v", F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        ).alias("maxabs"),
    )
    scale = F.col("maxabs") / F.lit(127.0)
    qc = F.transform("v", lambda x: F.floor(x * 127.0 / F.col("maxabs") + 0.5))
    staged = with_max.withColumn(
        "qc",
        F.when(F.col("maxabs") > 0, qc).otherwise(
            F.transform("v", lambda x: F.lit(0).cast("bigint"))
        ),
    )
    err = F.zip_with("v", "qc", lambda x, c: (x - c * scale) * (x - c * scale))
    abserr = F.zip_with("v", "qc", lambda x, c: F.abs(x - c * scale))
    return staged.select(
        "vec_id",
        F.round(scale, 9).alias("scale"),
        F.round(
            F.aggregate(abserr, F.lit(0.0), lambda a, x: F.greatest(a, x)), 6
        ).alias("max_abs_err"),
        F.when(
            F.col("maxabs") > 0,
            F.round(
                F.sqrt(F.aggregate(err, F.lit(0.0), lambda a, x: a + x))
                / _norm(F.col("v")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("rel_l2_err"),
    )


OUTLIER_PCT = 0.99
KNN_K = 3


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid-distance outliers (embedding QA pass).

    The corpus-hygiene question before training on embeddings: which
    vectors sit far from their own class centroid (mislabeled /
    corrupted rows)? Plan: per-label centroid via DIM independent
    avg() aggregates (embedding_centroids' shape — labels are a
    bounded keyspace, the shuffle moves 64 doubles per label), the
    centroid relation broadcast back onto the corpus scan, distance
    as a JVM-side zip_with/aggregate fold, then each label's exact
    p99 distance (bounded groups; ``percentile_approx`` is the
    unbounded-label path) broadcast again for the flag.

    Cross-engine: centroid components and distances are rounded to 6
    decimals before any comparison; the DuckDB oracle folds the same
    squared terms in the same index order (list_transform +
    list_sum), so threshold comparisons see identical doubles.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = (
        e.groupBy("label")
        .agg(
            *[
                F.round(F.avg(F.col("v").getItem(i)), 6).alias(f"c{i}")
                for i in range(DIM)
            ]
        )
        .select("label", F.array(*[F.col(f"c{i}") for i in range(DIM)]).alias("c"))
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = e.join(F.broadcast(cents), "label").select(
        "vec_id", "label", F.round(F.sqrt(d2), 6).alias("dist")
    )
    thr = dists.groupBy("label").agg(
        F.round(F.percentile("dist", OUTLIER_PCT), 6).alias("thr")
    )
    return dists.join(F.broadcast(thr), "label").select(
        "vec_id",
        "label",
        "dist",
        (F.col("dist") > F.col("thr")).cast("int").alias("is_outlier"),
    )


def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph (k=3) over the materialized IVF layout.

    The graph every graph-ANN serving structure (HNSW/NSG) and
    SemDeDup-style curation starts from. All-pairs is corpus² —
    instead, neighbors are searched ONLY within each vector's IVF
    list (equi-join on ``list_id``, Σ|list|² pair cost like
    dedup_semantic), then per-vector top-k via a window partitioned
    by the source vector. Recall vs brute force is pytest-asserted;
    rows-only for the driver (float cosine ranking isn't bit-stable
    across engines).
    """
    from . import ann_index

    idx = ann_index.build_ivf_index(spark, sf_dir, IVF_NLIST)
    import os

    corpus = spark.read.parquet(os.path.join(idx, "corpus")).select(
        "list_id", "vec_id", "v", _norm(F.col("v")).alias("norm")
    )
    a = corpus.alias("a")
    b = corpus.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(
        b,
        (F.col("a.list_id") == F.col("b.list_id"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("vec_id", F.col("rn").alias("rank"), "neighbor_id", "cosine")
    )


KMEANS_K = 8
KMEANS_ITERS = 5


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=8, 5 fixed iterations) over the embedding
    corpus — the topic-clustering / data-mixing primitive.

    Scale shape: centroids are the ONLY driver-side state (k×DIM
    doubles, bounded) — each iteration is one corpus pass that scores
    all k squared distances as JVM fold expressions, takes argmin via
    ``array_position(d, array_min(d))`` (deterministic first-index
    tie-break), and re-aggregates centroids as DIM independent avg()
    columns (the ``embedding_centroids`` no-explode shape). No
    all-pairs join, no per-row Python.

    Determinism: init = the k vectors with smallest ``xxhash64(vec_id)``
    (seeded by nothing but the corpus), centroids rounded to 6 dp and
    distances to 9 dp each round so float noise can't flip an argmin.
    Rows-only for the driver (iterative; numpy replica is
    pytest-asserted — tests/test_llm_ops.py).

    Output: (vec_id, cluster_id, dist) — dist is the vector's
    distance to its final centroid.
    """
    e = _embeddings(spark, sf_dir).select("vec_id", "v")
    init = (
        e.orderBy(F.xxhash64(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(KMEANS_K)
        .collect()
    )
    cents = [[round(float(x), 6) for x in r.v] for r in init]

    def dist_cols(cs):
        return F.array(
            *[
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("v"),
                            F.array(*[F.lit(x) for x in c]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    9,
                )
                for c in cs
            ]
        )

    for _ in range(KMEANS_ITERS):
        d = dist_cols(cents)
        assigned = e.withColumn(
            "cluster_id",
            (F.array_position(d, F.array_min(d)) - 1).cast("int"),
        )
        rows = (
            assigned.groupBy("cluster_id")
            .agg(*[F.avg(F.col("v").getItem(i)).alias(f"c{i}") for i in range(DIM)])
            .collect()
        )
        new_cents = list(cents)  # empty clusters keep their centroid
        for r in rows:
            new_cents[r.cluster_id] = [round(float(r[f"c{i}"]), 6) for i in range(DIM)]
        cents = new_cents

    d = dist_cols(cents)
    return e.select(
        "vec_id",
        (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("cluster_id"),
        F.round(F.sqrt(F.array_min(d)), 6).alias("dist"),
    )


#: k-center coreset size — driver state is K × DIM floats, constant.
KCENTER_K = 10


def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset: K maximally-spread embeddings — the
    classic diversity-selection pass for training data (coreset /
    active-learning seeding; 2-approximation of the optimal k-center
    cover by Gonzalez' theorem).

    Greedy loop: seed with vec_id 0, then K−1 times pick the point
    FARTHEST from its nearest chosen center. The per-row state is one
    ``mind`` column (squared L2 to the nearest center so far) carried
    in a localCheckpoint'd frame and tightened each round with
    ``least(mind, dist-to-newest-center)`` — one zip_with fold per
    round against a DIM-literal array (64 doubles, a normal
    expression tree), so each round is ONE scan with a 1-row argmax
    aggregate (``max(struct(dist, -vec_id))`` — deterministic
    tiebreak), and driver state is the K×DIM center list. At 100 TB:
    K scans, no shuffle beyond the argmax combine, nothing
    corpus-sized ever leaves the executors.

    Output: (rank, vec_id, dist) — dist is the point's distance to
    the nearest EARLIER center (the coverage radius achieved as each
    center lands; non-increasing in expectation, the seed row is 0).
    Rows-only (float iterative, like kmeans/pca); numpy-parity +
    farthest-point property pytests.
    """
    e = _embeddings(spark, sf_dir).localCheckpoint()
    center = [
        float(x)
        for x in e.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0].v
    ]
    picked = [(0, QUERY_VEC_ID, 0.0)]
    state = e.withColumn("mind", F.lit(float("inf")))
    for rank in range(1, KCENTER_K):
        c = F.array(*[F.lit(x) for x in center])
        d = F.aggregate(
            F.zip_with(F.col("v"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        state = state.withColumn(
            "mind", F.least(F.col("mind"), d)
        ).localCheckpoint()
        far = state.agg(
            F.max(
                F.struct(
                    F.round(F.sqrt("mind"), 6).alias("dist"),
                    (-F.col("vec_id")).alias("neg_id"),
                )
            ).alias("m")
        ).collect()[0].m
        vec_id = -far.neg_id
        picked.append((rank, vec_id, float(far.dist)))
        center = [
            float(x)
            for x in state.filter(F.col("vec_id") == vec_id).collect()[0].v
        ]
    return spark.createDataFrame(
        [(r, v, round(d, 6)) for r, v, d in picked],
        "rank long, vec_id long, dist double",
    )


ORACLES: dict[str, str] = {
    "embedding_quantize_int8": f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        m AS (
            SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS maxabs
            FROM v
        ),
        q AS (
            SELECT vec_id, v, maxabs,
                   CASE WHEN maxabs > 0
                        THEN list_transform(v, x -> floor(x * 127.0 / maxabs + 0.5))
                        ELSE list_transform(v, x -> 0.0) END AS qc
            FROM m
        )
        SELECT vec_id,
               round(maxabs / 127.0, 9) AS scale,
               round(list_max(list_transform(range(1, {DIM + 1}),
                     i -> abs(v[i] - qc[i] * (maxabs / 127.0)))), 6) AS max_abs_err,
               CASE WHEN maxabs > 0 THEN
                   round(sqrt(list_sum(list_transform(range(1, {DIM + 1}),
                         i -> (v[i] - qc[i] * (maxabs / 127.0))
                              * (v[i] - qc[i] * (maxabs / 127.0)))))
                         / sqrt(list_sum(list_transform(v, x -> x * x))), 6)
               ELSE 0.0 END AS rel_l2_err
        FROM q
    """,
    "embedding_norm_stats": f"""
        WITH norms AS (
            SELECT label,
                   round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                         x -> x * x))), 6) AS nrm
            FROM embeddings
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(nrm), 4) AS mean_norm,
               round(quantile_cont(nrm, 0.5), 6) AS p50_norm,
               round(min(nrm), 6) AS min_norm,
               round(max(nrm), 6) AS max_norm
        FROM norms GROUP BY label
    """,
    "embedding_outliers": f"""
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cent AS (
            SELECT label, list(round(cavg, 6) ORDER BY i) AS c
            FROM (
                SELECT label, i, avg(v[i + 1]) AS cavg
                FROM v, generate_series(0, {DIM - 1}) AS t(i)
                GROUP BY label, i
            ) GROUP BY label
        ),
        dists AS (
            SELECT vec_id, v.label,
                   round(sqrt(list_sum(list_transform(range(1, {DIM + 1}),
                         i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i])))), 6) AS dist
            FROM v JOIN cent c ON v.label = c.label
        ),
        thr AS (
            SELECT label, round(quantile_cont(dist, {OUTLIER_PCT}), 6) AS thr
            FROM dists GROUP BY label
        )
        SELECT vec_id, d.label, dist,
               CAST(dist > thr AS INT) AS is_outlier
        FROM dists d JOIN thr ON d.label = thr.label
    """,
    "ann_batch_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_BATCH_QUERIES}),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(e.v, q.qv), 6) AS cosine,
                   row_number() OVER (PARTITION BY q.query_id
                                      ORDER BY round(list_cosine_similarity(e.v, q.qv), 6) DESC,
                                               e.vec_id ASC) AS rn
            FROM e, q
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, cosine FROM scored WHERE rn <= {BATCH_TOP_K}
    """,
    "embedding_centroids": f"""
        SELECT label, CAST(i AS INT) AS dim, round(avg(v[i + 1]), 6) AS val
        FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             generate_series(0, {DIM - 1}) AS t(i)
        GROUP BY label, i
    """,
    "hard_negative_mining": f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        a AS (
            SELECT vec_id AS anchor_id, label AS anchor_label, v AS qv
            FROM e WHERE vec_id < {N_ANCHORS}
        ),
        scored AS (
            SELECT a.anchor_id, e.vec_id, e.label,
                   round(list_cosine_similarity(e.v, a.qv), 6) AS cosine,
                   row_number() OVER (PARTITION BY a.anchor_id
                                      ORDER BY round(list_cosine_similarity(e.v, a.qv), 6) DESC,
                                               e.vec_id ASC) AS rn
            FROM e, a
            WHERE e.label <> a.anchor_label
        )
        SELECT anchor_id, vec_id AS negative_id, label AS negative_label, cosine
        FROM scored WHERE rn <= {HARD_NEG_K}
    """,
    "ann_bruteforce_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
        FROM e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT {TOP_K}
    """,
    # the quantization-rung decision table: every method's ranking is
    # reproduced verbatim from the individual keys' oracles, then
    # intersected with the exact top-k — integer counts + ppm ratios,
    # so the whole eval hash-matches.
    "ann_recall_curve": f"""
        WITH e AS MATERIALIZED (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
        exact10 AS MATERIALIZED (
            SELECT e.vec_id FROM e, q WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY round(list_cosine_similarity(e.v, q.qv), 6) DESC,
                     e.vec_id ASC
            LIMIT {TOP_K}),
        bin10 AS (
            SELECT e.vec_id FROM e, q WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY len(list_filter(range({DIM}),
                         i -> (e.v[i + 1] > 0) <> (q.qv[i + 1] > 0))) ASC,
                     e.vec_id ASC
            LIMIT {TOP_K}),
        mrlpre AS (
            SELECT e.vec_id, e.v FROM e, q WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY round(list_cosine_similarity(
                         e.v[1:{MRL_PREFIX_DIM}], q.qv[1:{MRL_PREFIX_DIM}]), 6) DESC,
                     e.vec_id ASC
            LIMIT {MRL_RERANK_M}),
        mrl10 AS (
            SELECT m.vec_id FROM mrlpre m, q
            ORDER BY round(list_cosine_similarity(m.v, q.qv), 6) DESC,
                     m.vec_id ASC
            LIMIT {TOP_K}),
        mrlpre32 AS (
            SELECT e.vec_id, e.v FROM e, q WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY round(list_cosine_similarity(
                         e.v[1:{MRL_PREFIX_DIM_2}], q.qv[1:{MRL_PREFIX_DIM_2}]), 6) DESC,
                     e.vec_id ASC
            LIMIT {MRL_RERANK_M}),
        mrl3210 AS (
            SELECT m.vec_id FROM mrlpre32 m, q
            ORDER BY round(list_cosine_similarity(m.v, q.qv), 6) DESC,
                     m.vec_id ASC
            LIMIT {TOP_K}),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        qc AS (SELECT codes AS qcodes FROM c WHERE vec_id = {QUERY_VEC_ID}),
        sq810 AS (
            SELECT c.vec_id FROM c, qc WHERE c.vec_id <> {QUERY_VEC_ID}
            ORDER BY list_sum(list_transform(range({DIM}),
                         i -> (c.codes[i+1] - 128) * (qc.qcodes[i+1] - 128))) DESC,
                     c.vec_id ASC
            LIMIT {TOP_K})
        SELECT method, n_hits,
               CAST((1000000 * n_hits) // {TOP_K} AS BIGINT) AS recall_ppm
        FROM (
            SELECT 'binary' AS method,
                   (SELECT CAST(count(*) AS BIGINT) FROM bin10
                    JOIN exact10 USING (vec_id)) AS n_hits
            UNION ALL
            SELECT 'mrl',
                   (SELECT CAST(count(*) AS BIGINT) FROM mrl10
                    JOIN exact10 USING (vec_id))
            UNION ALL
            SELECT 'mrl32',
                   (SELECT CAST(count(*) AS BIGINT) FROM mrl3210
                    JOIN exact10 USING (vec_id))
            UNION ALL
            SELECT 'sq8',
                   (SELECT CAST(count(*) AS BIGINT) FROM sq810
                    JOIN exact10 USING (vec_id))
        )
    """,
    # MRL prefix shortlist + exact rerank: both cuts reproduced on the
    # same rounded-score + vec_id order, list slices are 1-based
    # inclusive in DuckDB (v[1:16] ≡ Spark slice(v, 1, 16)).
    "ann_mrl_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
        pre AS (
            SELECT e.vec_id, e.v,
                   round(list_cosine_similarity(
                       e.v[1:{MRL_PREFIX_DIM}], q.qv[1:{MRL_PREFIX_DIM}]), 6)
                       AS prefix_cosine
            FROM e, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY prefix_cosine DESC, e.vec_id ASC
            LIMIT {MRL_RERANK_M}
        )
        SELECT pre.vec_id, pre.prefix_cosine,
               round(list_cosine_similarity(pre.v, q.qv), 6) AS cosine
        FROM pre, q
        ORDER BY cosine DESC, pre.vec_id ASC
        LIMIT {TOP_K}
    """,
    # second rung: same program, prefix 32 (r08, probe-justified)
    "ann_mrl32_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
        pre AS (
            SELECT e.vec_id, e.v,
                   round(list_cosine_similarity(
                       e.v[1:{MRL_PREFIX_DIM_2}], q.qv[1:{MRL_PREFIX_DIM_2}]), 6)
                       AS prefix_cosine
            FROM e, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY prefix_cosine DESC, e.vec_id ASC
            LIMIT {MRL_RERANK_M}
        )
        SELECT pre.vec_id, pre.prefix_cosine,
               round(list_cosine_similarity(pre.v, q.qv), 6) AS cosine
        FROM pre, q
        ORDER BY cosine DESC, pre.vec_id ASC
        LIMIT {TOP_K}
    """,
    "ann_filtered_topk": f"""
        WITH e AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
        FROM e, q
        WHERE e.vec_id <> {QUERY_VEC_ID} AND e.label = {FILTER_LABEL}
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT {TOP_K}
    """,
    # Hamming distance re-derived dimension-wise: a sign mismatch per
    # dimension ≡ a set bit in sig XOR qsig, so no packing is needed
    # oracle-side — the comparison is integer-exact either way.
    "ann_binary_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id,
               CAST(len(list_filter(range({DIM}),
                        i -> (e.v[i + 1] > 0) <> (q.qv[i + 1] > 0))) AS BIGINT)
                   AS hamming
        FROM e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY hamming ASC, e.vec_id ASC
        LIMIT {TOP_K}
    """,
    # committed-layout twin: materializing the prefix column must not
    # change a single result row vs the in-scan slice
    "ann_mrl_indexed_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
        pre AS (
            SELECT e.vec_id, e.v,
                   round(list_cosine_similarity(
                       e.v[1:{MRL_PREFIX_DIM}], q.qv[1:{MRL_PREFIX_DIM}]), 6)
                       AS prefix_cosine
            FROM e, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY prefix_cosine DESC, e.vec_id ASC
            LIMIT {MRL_RERANK_M}
        )
        SELECT pre.vec_id, pre.prefix_cosine,
               round(list_cosine_similarity(pre.v, q.qv), 6) AS cosine
        FROM pre, q
        ORDER BY cosine DESC, pre.vec_id ASC
        LIMIT {TOP_K}
    """,
    # committed-layout twin: materializing the signature words must
    # not change a single result row vs the in-scan derivation
    "ann_binary_indexed_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id,
               CAST(len(list_filter(range({DIM}),
                        i -> (e.v[i + 1] > 0) <> (q.qv[i + 1] > 0))) AS BIGINT)
                   AS hamming
        FROM e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY hamming ASC, e.vec_id ASC
        LIMIT {TOP_K}
    """,
    "ann_filtered_binary_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                   FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
        h AS (
            SELECT e.vec_id, e.v,
                   CAST(len(list_filter(range({DIM}),
                            i -> (e.v[i + 1] > 0) <> (q.qv[i + 1] > 0))) AS BIGINT)
                       AS hamming
            FROM e, q
            WHERE e.vec_id <> {QUERY_VEC_ID} AND e.label = {FILTER_LABEL}
        ),
        cand AS (
            SELECT * FROM h ORDER BY hamming ASC, vec_id ASC
            LIMIT {BINARY_RERANK_M}
        )
        SELECT c.vec_id, c.hamming,
               round(list_cosine_similarity(c.v, q.qv), 6) AS cosine
        FROM cand c, q
        ORDER BY cosine DESC, c.vec_id ASC
        LIMIT {TOP_K}
    """,
    "ann_binary_rerank_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
        h AS (
            SELECT e.vec_id, e.v,
                   CAST(len(list_filter(range({DIM}),
                            i -> (e.v[i + 1] > 0) <> (q.qv[i + 1] > 0))) AS BIGINT)
                       AS hamming
            FROM e, q
            WHERE e.vec_id <> {QUERY_VEC_ID}
        ),
        cand AS (
            SELECT * FROM h ORDER BY hamming ASC, vec_id ASC
            LIMIT {BINARY_RERANK_M}
        )
        SELECT c.vec_id, c.hamming,
               round(list_cosine_similarity(c.v, q.qv), 6) AS cosine
        FROM cand c, q
        ORDER BY cosine DESC, c.vec_id ASC
        LIMIT {TOP_K}
    """,
    # SQ8: per-dim bounds re-derived from the same corpus aggregates,
    # the quantization expression reproduced with the IDENTICAL
    # operation order — (x − mn) * 255.0 / (mx − mn), floor, clamp —
    # so the IEEE-double intermediate (hence every code, hence the
    # integer ADC score) is bit-identical across engines.
    "ann_sq8_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS (
            SELECT vec_id,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        q AS (SELECT codes AS qc FROM c WHERE vec_id = {QUERY_VEC_ID})
        SELECT c.vec_id,
               CAST(list_sum(list_transform(range({DIM}),
                    i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                   AS sq8_score
        FROM c, q
        WHERE c.vec_id <> {QUERY_VEC_ID}
        ORDER BY sq8_score DESC, c.vec_id ASC
        LIMIT {TOP_K}
    """,
    # committed-layout twin: materializing the code words (frozen
    # bounds in _SQ8.json) must not change a single result row
    "ann_sq8_indexed_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS (
            SELECT vec_id,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        q AS (SELECT codes AS qc FROM c WHERE vec_id = {QUERY_VEC_ID})
        SELECT c.vec_id,
               CAST(list_sum(list_transform(range({DIM}),
                    i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                   AS sq8_score
        FROM c, q
        WHERE c.vec_id <> {QUERY_VEC_ID}
        ORDER BY sq8_score DESC, c.vec_id ASC
        LIMIT {TOP_K}
    """,
    # batch ADC twin: one scored relation per (query, vector) pair,
    # per-query rank — the quantization CTE is shared verbatim
    "ann_sq8_batch_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        q AS (SELECT vec_id AS query_id, codes AS qc FROM c
              WHERE vec_id < {N_BATCH_QUERIES}),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   CAST(list_sum(list_transform(range({DIM}),
                        i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                       AS sq8_score
            FROM c, q
            WHERE c.vec_id <> q.query_id
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, vec_id, sq8_score
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sq8_score DESC, vec_id ASC) AS rn
            FROM scored)
        WHERE rn <= {BATCH_TOP_K}
    """,
    # wide vector batch (r11): the SAME program at 240 stepped-id
    # queries — the generator replayed from count(*), integer ADC
    # keeps the whole batch hash-checkable.
    "ann_sq8_batch_wide": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        n AS (SELECT count(*) AS n FROM e),
        qids AS (
            SELECT DISTINCT i * greatest(n // {WIDE_VEC_QUERIES}, 1) AS query_id
            FROM generate_series(0, {WIDE_VEC_QUERIES - 1}) AS t(i), n
            WHERE i < n
        ),
        q AS (SELECT query_id, codes AS qc FROM c
              JOIN qids ON c.vec_id = qids.query_id),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   CAST(list_sum(list_transform(range({DIM}),
                        i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                       AS sq8_score
            FROM c, q
            WHERE c.vec_id <> q.query_id
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, vec_id, sq8_score
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sq8_score DESC, vec_id ASC) AS rn
            FROM scored)
        WHERE rn <= {BATCH_TOP_K}
    """,
    "ann_sq8_rerank_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS (
            SELECT vec_id, v,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        q AS (SELECT codes AS qc, v AS qv FROM c WHERE vec_id = {QUERY_VEC_ID}),
        scored AS (
            SELECT c.vec_id, c.v,
                   CAST(list_sum(list_transform(range({DIM}),
                        i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                       AS sq8_score
            FROM c, q
            WHERE c.vec_id <> {QUERY_VEC_ID}
        ),
        cand AS (
            SELECT * FROM scored ORDER BY sq8_score DESC, vec_id ASC
            LIMIT {SQ8_RERANK_M}
        )
        SELECT cd.vec_id, cd.sq8_score,
               round(list_cosine_similarity(cd.v, q.qv), 6) AS cosine
        FROM cand cd, q
        ORDER BY cosine DESC, cd.vec_id ASC
        LIMIT {TOP_K}
    """,
    "embedding_knn_eval": f"""
        WITH e AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
              FROM e WHERE vec_id < {KNN_EVAL_Q}),
        scored AS (
            SELECT q.query_id, q.qlabel, e.vec_id, e.label,
                   row_number() OVER (PARTITION BY q.query_id
                                      ORDER BY round(list_cosine_similarity(e.v, q.qv), 6) DESC,
                                               e.vec_id ASC) AS rn
            FROM e, q
            WHERE e.vec_id <> q.query_id
        ),
        topk AS (SELECT * FROM scored WHERE rn <= {KNN_EVAL_K})
        SELECT query_id, qlabel,
               CAST(coalesce(sum(CASE WHEN label = qlabel THEN 1 END), 0)
                    AS BIGINT) AS hits_at_k,
               CAST(coalesce(max(CASE WHEN label = qlabel
                                      THEN 1000000 // rn END), 0)
                    AS BIGINT) AS mrr_micro
        FROM topk GROUP BY query_id, qlabel
    """,
    # filtered SQ8: the BOUNDS train over the WHOLE corpus (the codec
    # is layout state frozen at build time, label-independent); only
    # the CANDIDATE set is filtered — the pre-filter-not-post-filter
    # contract.
    "ann_filtered_sq8_topk": f"""
        WITH e AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS (
            SELECT vec_id, label, v,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        q AS (SELECT codes AS qc, v AS qv FROM c WHERE vec_id = {QUERY_VEC_ID}),
        scored AS (
            SELECT c.vec_id, c.v,
                   CAST(list_sum(list_transform(range({DIM}),
                        i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                       AS sq8_score
            FROM c, q
            WHERE c.vec_id <> {QUERY_VEC_ID} AND c.label = {FILTER_LABEL}
        ),
        cand AS (
            SELECT * FROM scored ORDER BY sq8_score DESC, vec_id ASC
            LIMIT {SQ8_RERANK_M}
        )
        SELECT cd.vec_id, cd.sq8_score,
               round(list_cosine_similarity(cd.v, q.qv), 6) AS cosine
        FROM cand cd, q
        ORDER BY cosine DESC, cd.vec_id ASC
        LIMIT {TOP_K}
    """,
}

QUERIES = {
    "embedding_quantize_int8": embedding_quantize_int8,
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_binary_topk": ann_binary_topk,
    "ann_binary_rerank_topk": ann_binary_rerank_topk,
    "ann_binary_indexed_topk": ann_binary_indexed_topk,
    "ann_filtered_binary_topk": ann_filtered_binary_topk,
    "ann_sq8_topk": ann_sq8_topk,
    "ann_sq8_rerank_topk": ann_sq8_rerank_topk,
    "ann_mrl_topk": ann_mrl_topk,
    "ann_mrl32_topk": ann_mrl32_topk,
    "ann_mrl_indexed_topk": ann_mrl_indexed_topk,
    "ann_recall_curve": ann_recall_curve,
    "ann_sq8_indexed_topk": ann_sq8_indexed_topk,
    "ann_sq8_batch_topk": ann_sq8_batch_topk,
    "ann_sq8_batch_wide": ann_sq8_batch_wide,
    "ann_filtered_sq8_topk": ann_filtered_sq8_topk,
    "embedding_knn_eval": embedding_knn_eval,
    "ann_filtered_topk": ann_filtered_topk,
    "ann_filtered_ivf_topk": ann_filtered_ivf_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_multiprobe_topk": ann_multiprobe_topk,
    "lsh_multiprobe_eval": lsh_multiprobe_eval,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_batch_topk": ann_batch_topk,
    "embedding_centroids": embedding_centroids,
    "embedding_pca": embedding_pca,
    "dedup_semantic": dedup_semantic,
    "hard_negative_mining": hard_negative_mining,
    "embedding_outliers": embedding_outliers,
    "embedding_norm_stats": embedding_norm_stats,
    "knn_graph": knn_graph,
    "embedding_kmeans": embedding_kmeans,
    "kcenter_coreset": kcenter_coreset,
    "hybrid_search_indexed": hybrid_search_indexed,
    "hybrid_filtered_indexed": hybrid_filtered_indexed,
}


def _hybrid_indexed_oracle() -> str:
    """Both legs replayed from first principles, fused with the same
    rounding: lex0 is the WAND key's exact BM25 program (the bound is
    relation-invisible), vec0 is the SQ8 ADC-shortlist + exact-rerank
    program at the hybrid's top-20 cut."""
    from ..sources.inverted import WAND_QUERY_TERMS, _bm25_oracle_for
    from .retrieval import BM25_TOP, HYBRID_TOP, RRF_K

    return (
        """
    WITH lex0 AS MATERIALIZED (
"""
        + _bm25_oracle_for(WAND_QUERY_TERMS)
        + f"""
    ),
    lex AS (
        SELECT doc_id, bm25,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        FROM lex0
    ),
    vec0 AS MATERIALIZED (
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS (
            SELECT vec_id, v,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        q AS (SELECT codes AS qc, v AS qv FROM c WHERE vec_id = {QUERY_VEC_ID}),
        scored AS (
            SELECT c.vec_id, c.v,
                   CAST(list_sum(list_transform(range({DIM}),
                        i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                       AS sq8_score
            FROM c, q
            WHERE c.vec_id <> {QUERY_VEC_ID}
        ),
        cand AS (
            SELECT * FROM scored ORDER BY sq8_score DESC, vec_id ASC
            LIMIT {SQ8_RERANK_M}
        )
        SELECT cd.vec_id AS doc_id,
               round(list_cosine_similarity(cd.v, q.qv), 6) AS cosine
        FROM cand cd, q
        ORDER BY cosine DESC, cd.vec_id ASC
        LIMIT {BM25_TOP}
    ),
    vec AS (
        SELECT doc_id, cosine,
               row_number() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank
        FROM vec0
    ),
    fused AS (
        SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
               CAST(coalesce(l.lex_rank, -1) AS BIGINT) AS lex_rank,
               CAST(coalesce(v.vec_rank, -1) AS BIGINT) AS vec_rank,
               coalesce(l.bm25, 0.0) AS bm25,
               coalesce(v.cosine, 0.0) AS cosine,
               round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0.0)
                   + coalesce(1.0 / ({RRF_K} + v.vec_rank), 0.0), 6) AS rrf
        FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT {HYBRID_TOP}
"""
    )


ORACLES["hybrid_search_indexed"] = _hybrid_indexed_oracle()


def _hybrid_filtered_oracle() -> str:
    """The filtered hybrid replayed from first principles: lex0 is
    the WAND program with the label restriction applied PRE-cut (df /
    N / avgdl corpus-wide — the Lucene filter contract), vec0 the SQ8
    ADC-shortlist + exact-rerank program over the label-filtered
    candidate set (bounds still train corpus-wide: codec state is
    label-independent layout state). Fusion identical to the
    unfiltered twin."""
    from ..sources.inverted import WAND_QUERY_TERMS, _bm25_oracle_for
    from .retrieval import BM25_TOP, HYBRID_TOP, RRF_K

    return (
        """
    WITH lex0 AS MATERIALIZED (
"""
        + _bm25_oracle_for(WAND_QUERY_TERMS, label=FILTER_LABEL)
        + f"""
    ),
    lex AS (
        SELECT doc_id, bm25,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        FROM lex0
    ),
    vec0 AS MATERIALIZED (
        WITH e AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS (
            SELECT vec_id, label, v,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        q AS (SELECT codes AS qc, v AS qv FROM c WHERE vec_id = {QUERY_VEC_ID}),
        scored AS (
            SELECT c.vec_id, c.v,
                   CAST(list_sum(list_transform(range({DIM}),
                        i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                       AS sq8_score
            FROM c, q
            WHERE c.vec_id <> {QUERY_VEC_ID} AND c.label = {FILTER_LABEL}
        ),
        cand AS (
            SELECT * FROM scored ORDER BY sq8_score DESC, vec_id ASC
            LIMIT {SQ8_RERANK_M}
        )
        SELECT cd.vec_id AS doc_id,
               round(list_cosine_similarity(cd.v, q.qv), 6) AS cosine
        FROM cand cd, q
        ORDER BY cosine DESC, cd.vec_id ASC
        LIMIT {BM25_TOP}
    ),
    vec AS (
        SELECT doc_id, cosine,
               row_number() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank
        FROM vec0
    ),
    fused AS (
        SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
               CAST(coalesce(l.lex_rank, -1) AS BIGINT) AS lex_rank,
               CAST(coalesce(v.vec_rank, -1) AS BIGINT) AS vec_rank,
               coalesce(l.bm25, 0.0) AS bm25,
               coalesce(v.cosine, 0.0) AS cosine,
               round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0.0)
                   + coalesce(1.0 / ({RRF_K} + v.vec_rank), 0.0), 6) AS rrf
        FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT {HYBRID_TOP}
"""
    )


ORACLES["hybrid_filtered_indexed"] = _hybrid_filtered_oracle()


def _hybrid_batch_indexed_oracle() -> str:
    """Both batch programs replayed whole: lex0 is the pinned 5-query
    BM25 batch (the WAND routing is relation-invisible), vec0 the SQ8
    ADC-shortlist + exact-rerank batch; fusion per (query_id, doc_id)
    with the same rounding."""
    from ..sources.inverted import BM25_BATCH_TOP, _bm25_batch_oracle
    from .retrieval import HYBRID_TOP, RRF_K

    return (
        """
    WITH lex0 AS MATERIALIZED (
"""
        + _bm25_batch_oracle()
        + f"""
    ),
    lex AS (
        SELECT query_id, doc_id, bm25,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id) AS lex_rank
        FROM lex0
    ),
    vec0 AS MATERIALIZED (
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (
            SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM (
                SELECT i, min(v[i + 1]) AS mn, max(v[i + 1]) AS mx
                FROM e, generate_series(0, {DIM - 1}) AS t(i) GROUP BY i
            )
        ),
        c AS MATERIALIZED (
            SELECT vec_id, v,
                   list_transform(range({DIM}), i ->
                       CASE WHEN b.mxs[i+1] > b.mns[i+1]
                            THEN greatest(0, least(255,
                                 CAST(floor((v[i+1] - b.mns[i+1]) * 255.0
                                      / (b.mxs[i+1] - b.mns[i+1])) AS BIGINT)))
                            ELSE 0 END) AS codes
            FROM e, b
        ),
        q AS (SELECT vec_id AS query_id, codes AS qc, v AS qv FROM c
              WHERE vec_id < {N_BATCH_QUERIES}),
        scored AS (
            SELECT q.query_id, c.vec_id, c.v, q.qv,
                   CAST(list_sum(list_transform(range({DIM}),
                        i -> (c.codes[i+1] - 128) * (q.qc[i+1] - 128))) AS BIGINT)
                       AS sq8_score
            FROM c, q
            WHERE c.vec_id <> q.query_id
        ),
        cand AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sq8_score DESC, vec_id ASC) AS srn
                FROM scored)
            WHERE srn <= {SQ8_RERANK_M}
        )
        SELECT CAST(query_id AS BIGINT) AS query_id,
               vec_id AS doc_id,
               round(list_cosine_similarity(v, qv), 6) AS cosine
        FROM cand
    ),
    vec AS (
        SELECT query_id, doc_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, doc_id) AS vec_rank
        FROM vec0
        QUALIFY vec_rank <= {BM25_BATCH_TOP}
    ),
    fused AS (
        SELECT coalesce(l.query_id, v.query_id) AS query_id,
               coalesce(l.doc_id, v.doc_id) AS doc_id,
               CAST(coalesce(l.lex_rank, -1) AS BIGINT) AS lex_rank,
               CAST(coalesce(v.vec_rank, -1) AS BIGINT) AS vec_rank,
               coalesce(l.bm25, 0.0) AS bm25,
               coalesce(v.cosine, 0.0) AS cosine,
               round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0.0)
                   + coalesce(1.0 / ({RRF_K} + v.vec_rank), 0.0), 6) AS rrf
        FROM lex l FULL OUTER JOIN vec v
          ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    )
    SELECT query_id, doc_id, lex_rank, vec_rank, bm25, cosine, rrf
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf DESC, doc_id) AS rn
        FROM fused)
    WHERE rn <= {HYBRID_TOP}
"""
    )


ORACLES["hybrid_batch_indexed"] = _hybrid_batch_indexed_oracle()
QUERIES["hybrid_batch_indexed"] = hybrid_batch_indexed

"""Approximate-nearest-neighbor search over the embeddings table.

- ``ann_bruteforce_topk``: exact cosine top-k against a fixed query
  vector (vec_id 0). Oracle-checked vs DuckDB list_cosine_similarity.
  Dot products are JVM-side zip_with/aggregate folds — correctness
  baseline and small-candidate-set scorer.
- ``ann_lsh_topk``: random-hyperplane LSH. Codes are computed by an
  Arrow-batched pandas_udf (numpy matmul across the batch — the
  vectorized Python path, ~100× a row-at-a-time UDF); candidate set =
  bucket collision with the query in either 8-bit band; exact cosine
  re-rank on candidates only. Rows-only check (LSH recall is
  property-tested against brute force in tests/).

- ``ann_ivf_topk``: inverted-file index — coarse-quantize every
  vector to its nearest of NLIST centroids, probe the query's NPROBE
  nearest lists, exact re-rank inside them. Rows-only check; recall
  property-tested.

Scale notes: brute force is a full scan per query — fine for one
query, wrong for batch ANN; the LSH variant prunes to bucket
collisions, and at 100 TB the band tables would be bucketed/sorted on
(band, code) so probe queries touch only matching files. The IVF
corpus is partitioned by list id, so probes become partition pruning.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


@F.pandas_udf(LongType())
def _lsh_code(emb: pd.Series) -> pd.Series:
    """Arrow-batched hyperplane codes: one numpy matmul per batch."""
    mat = np.stack(emb.to_numpy())  # (batch, DIM)
    bits = (mat @ PLANES.T) > 0  # (batch, N_PLANES)
    codes = np.zeros(len(emb), dtype=np.int64)
    for i in range(N_PLANES):
        codes |= bits[:, i].astype(np.int64) << i
    return pd.Series(codes)


LSH_BAND_BITS = 4
LSH_N_BANDS = N_PLANES // LSH_BAND_BITS  # 4 bands of 4 bits


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine top-10 of vec_id 0: prune → exact re-rank.

    Candidates collide with the query in any of 4 4-bit bands of the
    16-bit hyperplane code. On near-uniform vectors this keeps ~50%
    neighbor recall while pruning ~4× of the corpus; real clustered
    embeddings prune far harder. Band width/count are the
    recall-vs-cost dial.
    """
    e = _embeddings(spark, sf_dir).withColumn("code", _lsh_code(F.col("v")))
    for i in range(LSH_N_BANDS):
        e = e.withColumn(
            f"b{i}",
            F.shiftrightunsigned(F.col("code"), i * LSH_BAND_BITS).bitwiseAND(
                F.lit((1 << LSH_BAND_BITS) - 1)
            ),
        )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qnorm"),
        *[F.col(f"b{i}").alias(f"qb{i}") for i in range(LSH_N_BANDS)],
    )
    collide = None
    for i in range(LSH_N_BANDS):
        cond = F.col(f"b{i}") == F.col(f"qb{i}")
        collide = cond if collide is None else (collide | cond)
    cand = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .filter(collide)
    )
    return (
        cand.withColumn(
            "cosine", F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qnorm")), 6)
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "cosine")
    )


IVF_NLIST = 16
IVF_NPROBE = 4


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize into lists, probe the nearest few.

    The inverted-file index in three steps:

    1. Centroids: the first ``IVF_NLIST`` vectors by ``vec_id`` — a
       deterministic seed set, collected driver-side like a dim table
       (bounded at NLIST rows regardless of corpus size).
    2. Assignment: every vector goes to its max-cosine centroid via an
       Arrow-batched pandas_udf (one normalized matmul per batch,
       ties to the lowest centroid id).
    3. Search: the query probes its ``IVF_NPROBE`` nearest lists only;
       exact cosine re-rank runs on that candidate subset.

    Rows-only check (like LSH: float argmax near list boundaries isn't
    bit-stable across engines); recall vs brute force is asserted in
    tests. At 100 TB the assigned corpus is written partitioned by
    ``list_id``, so a probe reads NPROBE/NLIST of the files — partition
    pruning does the candidate cut before any compute runs.
    """
    e = _embeddings(spark, sf_dir)
    seed = (
        e.filter(F.col("vec_id") < IVF_NLIST).orderBy("vec_id").collect()
    )  # NLIST-row dim-table collect, independent of corpus size
    cmat = np.stack([np.asarray(r.v) for r in seed])
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    @F.pandas_udf(LongType())
    def _assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(np.argmax(mat @ cnorm.T, axis=1).astype(np.int64))

    qrow = e.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    qvec = np.asarray(qrow.v)
    probe = np.argsort(-(cnorm @ (qvec / np.linalg.norm(qvec))))[
        :IVF_NPROBE
    ].tolist()

    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm(F.col("v")).alias("qnorm")
    )
    cand = (
        e.withColumn("list_id", _assign(F.col("v")))
        .filter(F.col("list_id").isin(probe) & (F.col("vec_id") != QUERY_VEC_ID))
        .crossJoin(F.broadcast(q))
    )
    return (
        cand.withColumn(
            "cosine",
            F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qnorm")), 6),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "cosine")
    )


N_BATCH_QUERIES = 5
BATCH_TOP_K = 5


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


ORACLES: dict[str, str] = {
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
    "ann_bruteforce_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
        FROM e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT {TOP_K}
    """,
}

QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_batch_topk": ann_batch_topk,
    "embedding_centroids": embedding_centroids,
}

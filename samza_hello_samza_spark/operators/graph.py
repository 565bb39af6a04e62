"""Iterative graph analytics over document-similarity edges.

``dedup_clusters`` already walks the near-dup graph for connected
components (min-label propagation). This module adds the weighted
centrality view of the same graph: **PageRank over jaccard-pair
edges** — which documents sit at the center of duplication clusters
(high centrality ⇒ canonical/hub copies; the curation signal behind
"keep the hub, drop the satellites").

Spark-first iterative shape:
- the edge list (undirected → both directions) with out-degree
  attached is materialized ONCE (``localCheckpoint``) so every
  iteration reuses the same partitioning instead of re-deriving the
  join input; each iteration is one equi-join (ranks ⋈ edges on src)
  + one groupBy(dst) — the minimal two-shuffle PageRank step.
- ranks are ``localCheckpoint``ed every few iterations to truncate
  the lineage (the classic iterative-algorithm failure is a
  10-iteration-deep plan tree).
- fixed iteration count + damping 0.85; every quantity is
  deterministic, so the whole thing is oracle-checked against a
  DuckDB RECURSIVE CTE running the identical power iteration.

Scale notes (100 TB): the edge relation is the output of the bounded
band-join dedup pass (pairs, not the corpus), ranks are one row per
participating doc. Both shuffles key on doc ids — AQE handles skewed
hub nodes (a hot dst in groupBy is split by skew-join handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _SHINGLES_SQL, dedup_ngram_jaccard

PR_ITERS = 10
PR_DAMP = 0.85


def doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 fixed iterations, d=0.85) on the jaccard-pair graph.

    Nodes: documents appearing in ≥1 near-dup pair (isolated docs have
    trivially uniform rank and are excluded — at scale they are ~all
    docs, and materializing a rank row for each would dwarf the graph).
    The undirected graph has no dangling nodes (every node has degree
    ≥ 1 in both directions), so no dangling-mass term is needed.
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # materialize (src, dst, deg) once; every iteration re-reads this
    edges_d = edges.join(deg, "src").repartition("src").localCheckpoint()
    n = edges_d.select("src").distinct().count()  # driver scalar
    ranks = (
        edges_d.select("src").distinct().withColumn("rank", F.lit(1.0 / n))
    )
    base = (1.0 - PR_DAMP) / n
    for it in range(PR_ITERS):
        contribs = edges_d.join(ranks, "src").select(
            F.col("dst").alias("src"), (F.col("rank") / F.col("deg")).alias("c")
        )
        ranks = contribs.groupBy("src").agg(
            (F.lit(base) + F.lit(PR_DAMP) * F.sum("c")).alias("rank")
        )
        if (it + 1) % 3 == 0:
            ranks = ranks.localCheckpoint()  # truncate iterative lineage
    return ranks.select(
        F.col("src").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


#: the recursive power iteration, verbatim the Spark loop's math.
_PAGERANK_SQL = (
    _SHINGLES_SQL.replace("WITH", "WITH RECURSIVE", 1)
    + f"""
    , counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN counts na ON na.doc_id = doc_a
        JOIN counts nb ON nb.doc_id = doc_b
        WHERE round(i / (na.n + nb.n - i), 6) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM edges),
    pr(it, node, rank) AS (
        SELECT 0, src, 1.0 / (SELECT n FROM nn)
        FROM (SELECT DISTINCT src FROM edges)
        UNION ALL
        SELECT it + 1, e.dst,
               (1.0 - {PR_DAMP}) / (SELECT n FROM nn)
               + {PR_DAMP} * sum(pr.rank / d.deg)
        FROM pr
        JOIN edges e ON e.src = pr.node
        JOIN deg d ON d.src = pr.node
        WHERE it < {PR_ITERS}
        GROUP BY it, e.dst
    )
    SELECT node AS doc_id, round(rank, 6) AS rank
    FROM pr WHERE it = {PR_ITERS}
    """
)

ORACLES: dict[str, str] = {
    "doc_pagerank": _PAGERANK_SQL,
}

QUERIES = {
    "doc_pagerank": doc_pagerank,
}

"""Bucketed (pre-partitioned) tables: shuffle-free co-located joins.

The reference repartitions streams onto the join key before joining
(cookbook/JoinExample.java:61-67 `partitionBy` on pageId — Samza's
contract is "co-partitioned inputs join without movement"). Batch
Spark's equivalent contract is *bucketing*: write both fact tables
`bucketBy(N, key)`, and every later join/aggregate on that key reads
the buckets already co-located — the Exchange disappears from the
plan entirely.

At 100 TB this is the difference between re-shuffling two multi-TB
fact tables on every query and paying the shuffle once at ingest:

- `lineitem ⋈ orders` on orderkey: both sides bucketed → SortMergeJoin
  with zero Exchange, and with `sortBy(key)` + one-file-per-bucket the
  per-bucket Sort disappears too.
- `groupBy(key)` on a bucketed key is map-side only — no Exchange.

One-file-per-bucket trick: `repartition(N, key)` before `bucketBy(N,
key)` uses the same Murmur3-hash-mod-N on both sides, so each write
task holds exactly one bucket's rows — one file per bucket, which is
what lets Spark trust the on-disk sort order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import load_table

FACT_BUCKET_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed+sorted external parquet table."""
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.option("path", path).mode("overwrite").saveAsTable(table_name)


def materialize_bucketed_facts(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    n_buckets: int = 8,
    prefix: str = "bkt",
) -> dict[str, str]:
    """Bucket the fact tables by orderkey — the once-at-ingest shuffle
    that every later order-grain join/rollup amortizes. Returns
    {table: catalog_name}."""
    names = {}
    for table, key in FACT_BUCKET_KEYS.items():
        name = f"{prefix}_{table}"
        bucketize(
            load_table(spark, sf_dir, table), name, key, n_buckets,
            f"{base_path}/{name}",
        )
        names[table] = name
    return names


def materialize_bucketed_documents(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    n_buckets: int = 8,
    name: str = "bkt_documents",
) -> str:
    """Documents bucketed by text_hash — the dedup-at-ingest layout.

    The hash is computed once at write time and the table lands
    bucketed on it, so every later exact-dedup groupBy/join on
    text_hash is map-side only. At 100 TB this turns each nightly
    dedup pass from a full-corpus shuffle into a bucket-local scan —
    the ingest shuffle is paid once, amortized over every pass.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import _normalized_text

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text_hash", F.md5(_normalized_text(F.col("text")))
    )
    bucketize(docs, name, "text_hash", n_buckets, f"{base_path}/{name}")
    return name


def dedup_exact_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """dedup_exact's plan over the bucketed layout: ZERO Exchange.

    Same output contract as ``operators.dedup.dedup_exact`` (doc_id,
    canonical_doc_id, is_duplicate); the groupBy and the join both run
    bucket-locally because the table is bucketed+sorted on text_hash.
    """
    from pyspark.sql import functions as F

    hashed = spark.table(name).select("doc_id", "text_hash")
    canon = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("canonical_doc_id"))
    return hashed.hint("merge").join(canon, "text_hash").select(
        "doc_id",
        "canonical_doc_id",
        (F.col("doc_id") != F.col("canonical_doc_id")).cast("int").alias("is_duplicate"),
    )


def co_located_join(spark: SparkSession, names: dict[str, str]) -> DataFrame:
    """lineitem ⋈ orders over bucketed tables.

    `hint("merge")` pins the sort-merge strategy so the demonstration
    is about the *exchange*, not AQE's broadcast demotion; on real
    fact-fact sizes SMJ is what the planner picks anyway.
    """
    li = spark.table(names["lineitem"])
    orders = spark.table(names["orders"])
    return li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)

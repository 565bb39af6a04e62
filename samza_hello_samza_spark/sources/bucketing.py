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


def co_located_join(spark: SparkSession, names: dict[str, str]) -> DataFrame:
    """lineitem ⋈ orders over bucketed tables.

    `hint("merge")` pins the sort-merge strategy so the demonstration
    is about the *exchange*, not AQE's broadcast demotion; on real
    fact-fact sizes SMJ is what the planner picks anyway.
    """
    li = spark.table(names["lineitem"])
    orders = spark.table(names["orders"])
    return li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)

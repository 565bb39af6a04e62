"""Skew and co-location utilities for 100 TB joins.

Two standard remedies Spark-first code reaches for when AQE's
runtime skew-split isn't enough (or the key distribution is known
ahead of time):

- ``salted_join``: fact-side keys are salted into N sub-keys, the
  dim side is exploded across all salts → the hot key's rows spread
  over N tasks instead of one straggler. Exact same join result.
- ``bucketed_tables``: persist both join sides bucketed+sorted by
  the join key into the warehouse; subsequent joins are
  exchange-free (SortMergeJoin with no Exchange under it) — the
  pattern for a fact table joined repeatedly on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, explode the dim side.

    Result is identical to ``fact.join(dim, key, how)``; the salt
    column spreads any single hot key across ``n_salts`` shuffle
    partitions. Use when one key holds ≫ 1/partitions of the rows.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    """Persist a table bucketed+sorted by the join key (saveAsTable)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables — no Exchange in the plan."""
    return spark.table(left_table).join(spark.table(right_table), key)

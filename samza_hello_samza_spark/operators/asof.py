"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, find the latest right row at-or-before its
timestamp within the same key. The naive formulations both fail at
100 TB: a range-condition join explodes to every earlier match before
aggregating it back down, and a per-key loop isn't a plan at all.

The scalable form is **tag-union + running last**:

1. tag both sides and union them into one (key, time)-stream;
2. one window partitioned by key, ordered by (time, side-tag) —
   right rows sort before left rows at equal timestamps, making the
   match inclusive;
3. ``last(right_value, ignorenulls=True)`` over the running frame
   carries the most recent right row forward;
4. keep only left rows.

One shuffle (by key), a linear per-partition scan, zero row
amplification. The right side is pre-deduplicated to one row per
(key, time) — max value wins — so results are deterministic; DuckDB's
native ASOF JOIN (the oracle) leaves equal-time ties unspecified
otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: latest ``right`` row at-or-before each left row.

    Returns all left columns plus ``value_cols`` from the matched right
    row (null when no right row precedes). ``right`` must be unique per
    (key, right_ts) for deterministic results.
    """
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c != key],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != key],
        *[F.col(c) for c in value_cols],
    )
    w = Window.partitionBy("_k").orderBy("_t", "_side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = lt.unionByName(rt).select(
        "_k",
        "_side",
        *[c for c in left.columns if c != key],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col("_k").alias(key),
        *[c for c in left.columns if c != key],
        *value_cols,
    )


def asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event enriched with the customer's latest order at-or-before it."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("event_id"), F.col("ts")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("order_ts"),
        )
        .agg(F.max("o_orderkey").alias("asof_orderkey"))
    )
    out = asof_join(
        ev, orders, key="user_id", left_ts="ts", right_ts="order_ts",
        value_cols=["asof_orderkey"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("event_ts_epoch"),
        "asof_orderkey",
    )


ORACLES: dict[str, str] = {
    "asof_last_order": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS asof_orderkey
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id,
               CAST(floor(epoch(e.ts)) AS BIGINT) AS event_ts_epoch,
               o.asof_orderkey
        FROM events e
        ASOF LEFT JOIN o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """,
}

QUERIES = {
    "asof_last_order": asof_last_order,
}

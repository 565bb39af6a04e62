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


def bucketed_range_join(
    fact: DataFrame,
    val_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range join (fact.val ∈ [lo, hi]) without a nested-loop join.

    Both sides are mapped onto fixed-width buckets: the fact row to its
    single bucket, each interval to every bucket it overlaps. The join
    becomes an *equi*-join on bucket id (hash-partitionable at any
    scale) and the exact range predicate filters inside the matched
    bucket. Cost is |fact| + Σ interval_width/bucket_width join rows —
    never |fact|×|intervals|. Each (fact, interval) pair meets in
    exactly one bucket (the fact's), so no dedup pass is needed.
    """
    f = fact.withColumn("_b", F.floor(F.col(val_col) / bucket_width))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    return (
        f.join(iv, "_b")
        .filter((F.col(val_col) >= F.col(lo_col)) & (F.col(val_col) <= F.col(hi_col)))
        .drop("_b")
    )


VALUE_BANDS = (
    ("low", 0.0, 50.0),
    ("mid", 50.0, 100.0),
    ("high", 100.0, 200.0),
    ("xhigh", 200.0, 1e9),
)


def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to a value-band interval table (range join).

    With a literal dim-sized band table the practical plan is a
    broadcast non-equi join (and fully static bands could even be a
    CASE expression); when the interval table is itself big, the
    bucketized form above is the plan that scales.
    """
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(list(VALUE_BANDS), ["band", "lo", "hi"])
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


ORACLES: dict[str, str] = {
    "range_join_value_bands": """
        SELECT band,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 100.0),
                     ('high', 100.0, 200.0), ('xhigh', 200.0, 1e9))
             AS bands(band, lo, hi)
          ON value >= lo AND value < hi
        GROUP BY band
    """,
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
    "range_join_value_bands": range_join_value_bands,
}

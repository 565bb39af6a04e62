"""Mergeable-sketch operators beyond the built-ins.

Spark ships HLL++ (``approx_count_distinct`` — used by
events_dau_approx) and KLL-ish percentiles (``percentile_approx``).
This module adds the third classic: a **count-min sketch** for
frequency estimation / heavy hitters over an unbounded key space —
the stream-side answer to "top users" when the exact
``groupBy(user_id)`` state would not fit anywhere.

The sketch is built with deterministic md5-derived hash rows, so the
whole pipeline — build, point-estimate, top-k — is reproducible AND
expressible in ANSI SQL, which makes this (unusually, for a sketch)
a fully oracle-checked operator rather than rows-only.

Scale notes (100 TB):
- the build is ONE corpus scan: each event explodes to D (row, bucket)
  pairs and aggregates into a D×W table (4×256 cells here) — map-side
  partial aggregation collapses each task's contribution to ≤ D·W
  rows, so the shuffle is bounded by the sketch size × tasks, not by
  the data.
- the estimate side joins candidate keys against the D×W cell table
  (broadcast — it is sketch-sized by construction) and takes
  min-over-rows; CMS guarantees estimate ≥ true count, the
  over-estimate bounded by εN with ε = e/W.
- at true stream scale the same fold runs under
  ``applyInPandasWithState`` (see streaming/jobs.py's counter) with
  the D×W array as the state value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

#: sketch geometry: D independent hash rows × W buckets.
CMS_D = 4
CMS_W = 256
#: report the top-k estimated-frequency keys.
CMS_TOP_K = 20


def _cms_bucket(key: F.Column, row: int) -> F.Column:
    """Row-salted md5 bucket — independent-ish hash per sketch row,
    identical in DuckDB (same string → same md5 → same hex parse)."""
    salted = F.concat(F.lit(f"{row}:"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % CMS_W
    )


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by count-min-sketch frequency estimate.

    Build: one events scan exploding each row into D (row, bucket)
    pairs → groupBy into the D×W cell table. Estimate: candidate keys
    (here the distinct users; on a true firehose, whatever key sample
    you track) join the broadcast cell table on their D buckets and
    keep min(cell). The exact count rides along for the
    overestimate-bound check (CMS never underestimates — asserted in
    tests and visible in the output).
    """
    events = load_table(spark, sf_dir, "events")
    pairs = F.array(
        *[
            F.struct(
                F.lit(row).alias("row"),
                _cms_bucket(F.col("user_id"), row).alias("bucket"),
            )
            for row in range(CMS_D)
        ]
    )
    from .dedup import explode_nonempty

    cells = (
        explode_nonempty(events, [], pairs, "p")
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    cand = exact.select(
        "user_id",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(row).alias("row"),
                        _cms_bucket(F.col("user_id"), row).alias("bucket"),
                    )
                    for row in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_count", "p.row", "p.bucket")
    est = (
        cand.join(F.broadcast(cells), ["row", "bucket"])  # sketch-sized build side
        .groupBy("user_id", "exact_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.select(
            "user_id",
            F.col("est_count").cast("long").alias("est_count"),
            F.col("exact_count").cast("long").alias("exact_count"),
        )
        .orderBy(F.desc("est_count"), F.asc("user_id"))
        .limit(CMS_TOP_K)
    )


_CMS_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5({row} || ':' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % "
    + str(CMS_W)
)

ORACLES: dict[str, str] = {
    "heavy_hitters_cms": f"""
        WITH pairs AS (
            SELECT user_id, r.row,
                   CASE r.row
                       {' '.join(f"WHEN {row} THEN {_CMS_BUCKET_SQL.format(row=row)}" for row in range(CMS_D))}
                   END AS bucket
            FROM events, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS row) r
        ),
        cells AS (
            SELECT row, bucket, count(*) AS cnt FROM pairs GROUP BY row, bucket
        ),
        exact AS (
            SELECT user_id, count(*) AS exact_count FROM events GROUP BY user_id
        ),
        est AS (
            SELECT e.user_id, e.exact_count, min(c.cnt) AS est_count
            FROM exact e,
                 (SELECT unnest(generate_series(0, {CMS_D - 1})) AS row) r
            JOIN cells c
              ON c.row = r.row
             AND c.bucket = CASE r.row
                     {' '.join(f"WHEN {row} THEN CAST(concat('0x', substr(md5('{row}:' || CAST(e.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {CMS_W}" for row in range(CMS_D))}
                 END
            GROUP BY e.user_id, e.exact_count
        )
        SELECT user_id,
               CAST(est_count AS BIGINT) AS est_count,
               CAST(exact_count AS BIGINT) AS exact_count
        FROM est
        ORDER BY est_count DESC, user_id ASC
        LIMIT {CMS_TOP_K}
    """,
}

QUERIES = {
    "heavy_hitters_cms": heavy_hitters_cms,
}

"""Zone maps: explicit per-file min/max statistics + file skipping.

Parquet row-group stats prune WITHIN a scan, but the scheduler still
lists and opens every file to read its footer. A zone map is the
warehouse-level answer (Delta/Iceberg data skipping, Netezza zone
maps): a tiny stats table — one row per data file with min/max per
indexed column — consulted BEFORE the scan, so a selective predicate
turns a 100 TB file listing into the handful of files whose ranges
overlap. On a clustered layout (``zorder.write_zordered`` or a sorted
ingest) the ranges are tight and skipping approaches the selectivity
of the predicate; on random layout every file overlaps everything and
the zone map honestly prunes nothing — the stats table tells you
which, per column, before you run anything.

Scale shape:
- build: ONE scan of the table grouped by ``input_file_name()`` —
  map-side combine collapses each task's contribution to one row per
  (file), so the shuffle is file-count-sized, never data-sized.
- stats table: |files| × |indexed cols| rows of (min, max) — KB per
  100 TB; stored as parquet next to the data, re-read in one small
  scan per query.
- prune: predicate ranges are evaluated against the stats table and
  the surviving FILE LIST feeds ``spark.read.parquet(*files)`` — the
  cut happens at file listing, upstream of partition pruning,
  row-group stats, and column pruning, all of which still apply to
  the files that remain.
- correctness: skipping is conservative (a file is dropped only when
  its [min, max] provably cannot satisfy the predicate), so results
  are identical to the full scan — pytest-asserted, along with the
  file-count reduction on a z-ordered layout.

Maintenance: the build is deterministic from the file set; after an
append or compaction, rebuild (cost: one scan of the table — or fold
only the new files' stats in, since per-file rows are independent;
``refresh_new_files`` does exactly that).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_DIRNAME = "_zonemap"


def _stats_dir(table_dir: str) -> str:
    return os.path.join(table_dir, STATS_DIRNAME)


def _file_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"max_{c}"))
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    )


def build_zonemap(spark: SparkSession, table_dir: str, cols: list[str]) -> str:
    """One-scan zone-map build over every data file in ``table_dir``.

    Numeric columns only (min/max cast to double — the comparison
    domain both the build and the prune share). Returns the stats dir.
    """
    df = spark.read.parquet(table_dir)
    stats = _file_stats(df, cols)
    out = _stats_dir(table_dir)
    stats.write.mode("overwrite").parquet(out)
    return out


def refresh_new_files(spark: SparkSession, table_dir: str, cols: list[str]) -> int:
    """Fold stats for files missing from the zone map (post-append).

    Per-file rows are independent, so an append needs only the NEW
    files scanned — cost ∝ delta, not table. Returns files added.
    """
    out = _stats_dir(table_dir)
    # Diff the file LISTING (metadata-only, no data scan) against the
    # stats table's anti-joined _file column — NOT a collected
    # isin() literal: at 100 TB the known-file set is millions of
    # paths and a literal IN-list of that size blows up driver memory
    # and analysis time. listing ⟕ stats is file-count-sized on both
    # sides; only the surviving DELTA files are then scanned, so the
    # data cost really is ∝ delta.
    listing = spark.createDataFrame(
        [(f,) for f in spark.read.parquet(table_dir).inputFiles()], "_file string"
    )
    known = spark.read.parquet(out).select("_file")
    new_files = [
        r._file for r in listing.join(known, "_file", "left_anti").collect()
    ]
    if not new_files:
        return 0
    fresh = _file_stats(spark.read.parquet(*new_files), cols)
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(out)
    return n


def pruned_files(
    spark: SparkSession, table_dir: str, ranges: dict[str, tuple[float, float]]
) -> list[str]:
    """Files whose zone could satisfy ALL the closed-interval
    predicates in ``ranges`` ({col: (lo, hi)}).

    Conservative overlap test per column: keep the file unless
    max_col < lo or min_col > hi (NULL stats — all-null file — keep).
    The collect is the surviving file LIST: bounded by file count, the
    same driver-side quantity any scan's file listing already holds.
    """
    stats = spark.read.parquet(_stats_dir(table_dir))
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        overlap = ~(
            (F.col(f"max_{c}") < F.lit(float(lo)))
            | (F.col(f"min_{c}") > F.lit(float(hi)))
        )
        cond = cond & F.coalesce(overlap, F.lit(True))
    return [r._file for r in stats.filter(cond).select("_file").collect()]


# -- registered demo query: the zone map as a serving layout ---------------

#: the box predicate the pruned-scan key answers (selective on both
#: z-ordered dimensions so the zone map actually prunes).
PRICE_LO, PRICE_HI = 30_000.0, 40_000.0
QTY_LO, QTY_HI = 10.0, 20.0
_ZM_FILES = 32


def _zordered_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Z-ordered + zone-mapped lineitem copy, built once per sf_dir —
    corpus state under the shared index root, exactly the ANN-index /
    graph-edge-table discipline (builds are warmup; queries time the
    steady-state pruned read)."""
    from ..operators.ann_index import _index_root, _is_built, _tag
    from ..session import load_table
    from .zorder import write_zordered

    out = os.path.join(_index_root(), _tag(sf_dir), "zorder_lineitem")
    if not _is_built(out):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        )
        write_zordered(li, out, "l_extendedprice", "l_quantity", files=_ZM_FILES)
    if not os.path.exists(_stats_dir(out)):
        build_zonemap(spark, out, ["l_extendedprice", "l_quantity"])
    return out


def lineitem_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective 2-D box aggregate THROUGH the zone-mapped z-ordered
    layout — the registered probe that the clustering + file-skipping
    stack serves real queries, not just microbenchmarks.

    The scan reads only the files whose (price, quantity) zones
    overlap the box (file skipping at listing time; pruning ratio is
    pytest-asserted), re-applies the exact predicate, and aggregates.
    Result ≡ the same aggregate over the raw table (the conservative-
    skipping guarantee) — which is exactly what the DuckDB oracle
    computes, so the equivalence is hash-checked every round.
    """
    table_dir = _zordered_lineitem(spark, sf_dir)
    df = zonemap_read(
        spark,
        table_dir,
        {
            "l_extendedprice": (PRICE_LO, PRICE_HI),
            "l_quantity": (QTY_LO, QTY_HI),
        },
    )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.count_distinct("l_orderkey").cast("long").alias("n_orders"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("decimal(18,2)")
        .cast("double")
        .alias("revenue"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


ORACLES: dict[str, str] = {
    "lineitem_pruned_scan": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty
        FROM lineitem
        WHERE l_extendedprice BETWEEN {PRICE_LO} AND {PRICE_HI}
          AND l_quantity BETWEEN {QTY_LO} AND {QTY_HI}
    """,
}

QUERIES = {
    "lineitem_pruned_scan": lineitem_pruned_scan,
}


def zonemap_read(
    spark: SparkSession, table_dir: str, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """Scan only the overlapping files, with the exact predicate
    re-applied (skipping is conservative; the residual filter makes
    the composition exactly equal to the full-scan filter)."""
    files = pruned_files(spark, table_dir, ranges)
    if not files:
        base = spark.read.parquet(table_dir)
        return base.filter(F.lit(False))
    df = spark.read.option("basePath", table_dir).parquet(*files)
    for c, (lo, hi) in ranges.items():
        df = df.filter(
            (F.col(c).cast("double") >= float(lo))
            & (F.col(c).cast("double") <= float(hi))
        )
    return df

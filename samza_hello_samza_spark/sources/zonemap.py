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


def _file_stats(
    df: DataFrame, cols: list[str], str_cols: list[str] | None = None
) -> DataFrame:
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"max_{c}"))
    # string columns keep their native type: parquet/Spark min/max on
    # strings is lexicographic (binary collation), which is exactly the
    # comparison the prune-side overlap test uses — equality and prefix
    # predicates become closed string intervals ('MAIL'..'MAIL',
    # 'PROMO'..'PROMO￿').
    for c in str_cols or ():
        aggs.append(F.min(F.col(c).cast("string")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"max_{c}"))
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    )


def build_zonemap(
    spark: SparkSession,
    table_dir: str,
    cols: list[str],
    str_cols: list[str] | None = None,
) -> str:
    """One-scan zone-map build over every data file in ``table_dir``.

    ``cols`` are numeric (min/max cast to double — the comparison
    domain both the build and the prune share); ``str_cols`` keep
    lexicographic string min/max. Returns the stats dir.
    """
    df = spark.read.parquet(table_dir)
    stats = _file_stats(df, cols, str_cols)
    out = _stats_dir(table_dir)
    stats.write.mode("overwrite").parquet(out)
    return out


def _bound(v) -> F.Column:
    """A range bound as a literal in its comparison domain: strings
    compare lexicographically against the string stats columns,
    everything else as double against the numeric ones."""
    return F.lit(v if isinstance(v, str) else float(v))


def refresh_new_files(
    spark: SparkSession,
    table_dir: str,
    cols: list[str],
    str_cols: list[str] | None = None,
) -> int:
    """Fold stats for files missing from the zone map (post-append).

    Per-file rows are independent, so an append needs only the NEW
    files scanned — cost ∝ delta, not table. Returns files added.
    """
    out = _stats_dir(table_dir)
    # Diff the file listing against the stats table DISTRIBUTEDLY:
    # the listing side is `input_file_name()` over an EMPTY projection
    # of the data scan (executors materialize row counts from parquet
    # metadata — no column data moves), reduced by a partial-agg
    # distinct to one row per file, then anti-joined to the known
    # `_file` set. No per-file rows ever sit on the driver (the
    # pre-r07 `inputFiles()` local relation held one path string per
    # table file); the only collect below is the surviving DELTA —
    # bounded by the append, not the table. The known-file set is a
    # joined relation, never an `isin()` literal.
    listing = (
        spark.read.parquet(table_dir)
        .select(F.input_file_name().alias("_file"))
        .distinct()
    )
    known = spark.read.parquet(out).select("_file")
    new_files = [
        r._file for r in listing.join(known, "_file", "left_anti").collect()
    ]
    if not new_files:
        return 0
    fresh = _file_stats(spark.read.parquet(*new_files), cols, str_cols)
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
            (F.col(f"max_{c}") < _bound(lo)) | (F.col(f"min_{c}") > _bound(hi))
        )
        cond = cond & F.coalesce(overlap, F.lit(True))
    return [r._file for r in stats.filter(cond).select("_file").collect()]


def pruned_files_multi(
    spark: SparkSession,
    table_dir: str,
    boxes: list[dict[str, tuple[float, float]]],
) -> list[str]:
    """Files whose zone could satisfy ANY of the boxes — disjunctive
    pruning for OR-of-ANDs predicates (TPC-H Q19 shape).

    One pass over the stats table: keep a file when it overlaps at
    least one box. A file matching several boxes appears once (the
    caller re-applies the exact disjunction, so double-reads would
    also double-count).
    """
    stats = spark.read.parquet(_stats_dir(table_dir))
    any_cond = F.lit(False)
    for ranges in boxes:
        cond = F.lit(True)
        for c, (lo, hi) in ranges.items():
            overlap = ~(
                (F.col(f"max_{c}") < _bound(lo)) | (F.col(f"min_{c}") > _bound(hi))
            )
            cond = cond & F.coalesce(overlap, F.lit(True))
        any_cond = any_cond | cond
    return [r._file for r in stats.filter(any_cond).select("_file").collect()]


def pruned_scan(
    spark: SparkSession,
    table_dir: str,
    boxes: list[dict[str, tuple[float, float]]],
) -> DataFrame:
    """File-skipped scan WITHOUT a residual filter: the caller applies
    its own exact predicate (needed when the predicate isn't a closed
    box — strict bounds, date comparisons, OR-of-ANDs). Conservative
    skipping guarantees the surviving files are a superset of every
    qualifying row."""
    files = pruned_files_multi(spark, table_dir, boxes)
    if not files:
        return spark.read.parquet(table_dir).filter(F.lit(False))
    return spark.read.option("basePath", table_dir).parquet(*files)


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


def refresh_merged_buckets(
    spark: SparkSession,
    table_dir: str,
    cols: list[str],
    buckets: list[int],
    str_cols: list[str] | None = None,
) -> int:
    """Post-MERGE zone-map maintenance for a bucketed lakehouse table
    (``MergeTable``): re-derive per-file stats for ONLY the touched
    ``_bucket=B`` directories and carry every other stats row over
    unchanged.

    A merge dynamic-overwrites exactly its touched bucket dirs, so
    the stats rows keyed by the old files in those dirs are dead and
    every file elsewhere is bit-identical (MergeTable's pytest-
    asserted contract) — data-scan cost is ∝ touched buckets, never
    O(table), and the stats rewrite itself is file-count-sized (KB).
    The kept rows are materialized (localCheckpoint) before the
    overwrite so the read never races its own sink. Returns the
    number of refreshed file rows.
    """
    out = _stats_dir(table_dir)
    if not buckets:  # no touched buckets → the stats table is current
        return 0
    markers = [f"/_bucket={b}/" for b in buckets]
    touched_col = None
    for m in markers:
        c = F.col("_file").contains(m)
        touched_col = c if touched_col is None else (touched_col | c)
    old = spark.read.parquet(out)
    # materialize BEFORE the overwrite below — the sink is the path
    # this very plan reads from.
    kept = old.filter(~touched_col).localCheckpoint()
    dirs = [
        os.path.join(table_dir, f"_bucket={b}")
        for b in buckets
        if os.path.isdir(os.path.join(table_dir, f"_bucket={b}"))
    ]
    if dirs:
        fresh = _file_stats(
            spark.read.option("basePath", table_dir).parquet(*dirs).drop("_bucket"),
            cols,
            str_cols,
        )
        n = fresh.count()
        kept.unionByName(fresh).write.mode("overwrite").parquet(out)
    else:  # every touched bucket emptied out — nothing to scan
        n = 0
        kept.write.mode("overwrite").parquet(out)
    return n


# -- zone-map twins of the showcase pushdown queries (q6 / q19) ------------

#: epoch-day bounds of the q6 ship-year window (1997), precomputed so
#: the box is a pure literal: datediff('1997-01-01','1970-01-01')=9862.
_Q6_DAY_LO, _Q6_DAY_HI = 9862.0, 10227.0  # hi overcovers by 1 day; residual trims


def _zordered_lineitem_ship(spark: SparkSession, sf_dir: str) -> str:
    """(ship_day, discount)-clustered lineitem projection for the q6
    family — date-selective scans. Same build-once index-root
    discipline as ``_zordered_lineitem``; ``_ship_day`` is the
    epoch-day of l_shipdate, materialized so the zone map (numeric
    min/max) can skip on a date predicate."""
    from ..operators.ann_index import _index_root, _is_built, _tag
    from ..session import load_table
    from .zorder import write_zordered

    out = os.path.join(_index_root(), _tag(sf_dir), "zorder_lineitem_ship")
    if not _is_built(out):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_shipdate",
            "l_discount",
            "l_quantity",
            "l_extendedprice",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("_ship_day"),
        )
        write_zordered(li, out, "_ship_day", "l_discount", files=_ZM_FILES)
    if not os.path.exists(_stats_dir(out)):
        build_zonemap(spark, out, ["_ship_day", "l_discount", "l_quantity"])
    return out


def q6_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 routed through the zone-mapped (ship_day, discount)
    layout: the file listing drops every file whose zones miss the
    1997 × [0.05, 0.07] × (<24) box, then the EXACT q6 predicate
    re-applies on the survivors (skipping is conservative, so the
    composition equals the full scan — DuckDB-oracle-checked).
    Reference analog: the predicate-pushdown showcase of SURVEY §2;
    this key pushes the predicate past the scan INTO the listing."""
    table_dir = _zordered_lineitem_ship(spark, sf_dir)
    df = pruned_scan(
        spark,
        table_dir,
        [
            {
                "_ship_day": (_Q6_DAY_LO, _Q6_DAY_HI),
                "l_discount": (0.05, 0.07),
                "l_quantity": (-1e18, 24.0),
            }
        ],
    )
    return df.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.coalesce(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
            ),
            F.lit(0).cast("decimal(18,4)"),
        )
        .cast("decimal(18,2)")
        .cast("double")
        .alias("revenue"),
    )


#: q19's three conjunctive clauses as (brand, quantity, size) boxes.
_Q19_BOXES = [
    {"_brand_num": (12.0, 12.0), "l_quantity": (1.0, 11.0), "p_size": (1.0, 5.0)},
    {"_brand_num": (23.0, 23.0), "l_quantity": (10.0, 20.0), "p_size": (1.0, 10.0)},
    {"_brand_num": (34.0, 34.0), "l_quantity": (26.0, 36.0), "p_size": (1.0, 15.0)},
]


def _zordered_lineitem_brand(spark: SparkSession, sf_dir: str) -> str:
    """Denormalized (brand, quantity)-clustered lineitem⨝part
    projection for the q19 family — the Vertica-projection /
    materialized-sort-order design: the join is paid ONCE at layout
    build (broadcast of the small part dim), after which a
    brand-selective disjunction prunes at file listing instead of
    scanning the fact table. ``_brand_num`` is the numeric brand id
    ('Brand#12' → 12) so the zone map can box it."""
    from ..operators.ann_index import _index_root, _is_built, _tag
    from ..session import load_table
    from .zorder import write_zordered

    out = os.path.join(_index_root(), _tag(sf_dir), "zorder_lineitem_brand")
    if not _is_built(out):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
        )
        part = load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_size"
        )
        joined = li.join(
            F.broadcast(part), li.l_partkey == part.p_partkey
        ).select(
            "p_brand",
            "p_size",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            F.substring_index("p_brand", "#", -1).cast("int").alias("_brand_num"),
        )
        write_zordered(joined, out, "_brand_num", "l_quantity", files=_ZM_FILES)
    if not os.path.exists(_stats_dir(out)):
        build_zonemap(spark, out, ["_brand_num", "l_quantity", "p_size"])
    return out


def q19_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 routed through the zone map: the OR-of-ANDs predicate
    becomes a UNION of three (brand, quantity, size) boxes evaluated
    against the stats table in one pass (``pruned_files_multi``); only
    files overlapping at least one clause are listed, then the exact
    disjunction re-applies. On the brand-clustered layout each clause
    touches ~1/25 of the files, so the disjunctive scan reads a small
    fraction of the projection (pytest-asserted <1/2)."""
    table_dir = _zordered_lineitem_brand(spark, sf_dir)
    df = pruned_scan(spark, table_dir, _Q19_BOXES)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(26, 36)
        )
    )
    return df.filter(clause).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.coalesce(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            F.lit(0).cast("decimal(18,4)"),
        )
        .cast("decimal(18,2)")
        .cast("double")
        .alias("revenue"),
    )


# -- string zone maps: categorical-clustered layout (returnflag) -----------

#: epoch-day bounds of the 1997 ship window (shared with the q6 twin).
_Y97_DAY_LO, _Y97_DAY_HI = 9862.0, 10227.0


def _clustered_lineitem_flag(spark: SparkSession, sf_dir: str) -> str:
    """(l_returnflag, ship_day) lexicographically-clustered lineitem
    projection with STRING zone-map stats on the leading categorical —
    §7.15's "zone-map stats for string columns". The flag has 3 values,
    so ``write_clustered`` gives every file a single flag value (plus
    at most 2 boundary files); min/max on the string column then lets
    an equality predicate prune at file listing, with ship-day ranges
    tight within each flag run. Same build-once index-root discipline
    as the numeric layouts."""
    from ..operators.ann_index import _index_root, _is_built, _tag
    from ..session import load_table
    from .zorder import write_clustered

    out = os.path.join(_index_root(), _tag(sf_dir), "clustered_lineitem_flag")
    if not _is_built(out):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("_ship_day"),
        )
        write_clustered(li, out, ["l_returnflag", "_ship_day"], files=_ZM_FILES)
    if not os.path.exists(_stats_dir(out)):
        build_zonemap(spark, out, ["_ship_day"], str_cols=["l_returnflag"])
    return out


def returned_items_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly returned-line revenue for 1997 through the string zone
    map: the ``l_returnflag = 'R'`` equality becomes the closed string
    interval ('R', 'R') against the lexicographic file stats, composed
    with the numeric ship-day box — only files whose flag run AND date
    range overlap are listed (pytest-asserted <½), then the exact
    predicate re-applies. Conservative skipping ⇒ result ≡ full scan,
    which is what the DuckDB oracle computes (hash-checked).
    Reference analog: the q10 returned-items filter of SURVEY §2, here
    pushed past the scan into the file listing."""
    table_dir = _clustered_lineitem_flag(spark, sf_dir)
    df = pruned_scan(
        spark,
        table_dir,
        [{"l_returnflag": ("R", "R"), "_ship_day": (_Y97_DAY_LO, _Y97_DAY_HI)}],
    )
    return (
        df.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue"),
        )
    )


# -- zone maps over ARRAY columns: embedding-dimension boxes ----------------

#: the embedding dimensions the layout clusters on (leading pair) and
#: the registered probe's L∞ box over them.
_EMB_D0_LO, _EMB_D0_HI = 0.05, 1.0
_EMB_D1_LO, _EMB_D1_HI = 0.05, 1.0


def _zordered_embeddings(spark: SparkSession, sf_dir: str) -> str:
    """Embeddings clustered along (v[0], v[1]) with zone-map stats on
    the MATERIALIZED leading dimensions — §7.18's "zone-map stats on
    array columns": an array column has no scalar min/max, so the
    indexed dimensions are projected out as ``_d0``/``_d1`` scalar
    columns at layout-build time (the array itself rides along
    untouched) and the standard numeric zone map applies. On the
    Z-ordered layout every file is an axis-aligned rectangle in
    (d0, d1) space — a bounding box per file — so an L∞ box probe
    prunes at file listing exactly like the lineitem layouts."""
    from ..operators.ann_index import _index_root, _is_built, _tag
    from ..session import load_table
    from .zorder import write_zordered

    out = os.path.join(_index_root(), _tag(sf_dir), "zorder_embeddings")
    if not _is_built(out):
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            "embedding",
            F.col("embedding").getItem(0).cast("double").alias("_d0"),
            F.col("embedding").getItem(1).cast("double").alias("_d1"),
        )
        write_zordered(emb, out, "_d0", "_d1", files=_ZM_FILES)
    if not os.path.exists(_stats_dir(out)):
        build_zonemap(spark, out, ["_d0", "_d1"])
    return out


def embedding_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L∞ box query over embedding space through the zone map: count
    and checksum the vectors whose leading dimensions fall in the
    probe box, reading only the files whose (d0, d1) bounding boxes
    overlap it (<½ files, pytest-asserted). The residual predicate
    re-applies on the ARRAY column itself, so the result is exactly
    the full-scan filter — which is what the DuckDB oracle computes
    over the raw table (hash-checked). The block-pruning primitive
    under windowed vector-range retrieval at 100 TB: the bounding
    boxes cut the candidate file set before any vector is read."""
    table_dir = _zordered_embeddings(spark, sf_dir)
    df = pruned_scan(
        spark,
        table_dir,
        [{"_d0": (_EMB_D0_LO, _EMB_D0_HI), "_d1": (_EMB_D1_LO, _EMB_D1_HI)}],
    )
    d0 = F.col("embedding").getItem(0).cast("double")
    d1 = F.col("embedding").getItem(1).cast("double")
    return df.filter(
        d0.between(_EMB_D0_LO, _EMB_D0_HI) & d1.between(_EMB_D1_LO, _EMB_D1_HI)
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.coalesce(F.sum("vec_id"), F.lit(0)).cast("long").alias("id_checksum"),
        F.round(F.coalesce(F.min(d0), F.lit(0.0)), 6).alias("min_d0"),
        F.round(F.coalesce(F.max(d1), F.lit(0.0)), 6).alias("max_d1"),
    )


ORACLES: dict[str, str] = {
    "embedding_box_scan": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(coalesce(sum(vec_id), 0) AS BIGINT) AS id_checksum,
               round(coalesce(min(CAST(embedding[1] AS DOUBLE)), 0.0), 6) AS min_d0,
               round(coalesce(max(CAST(embedding[2] AS DOUBLE)), 0.0), 6) AS max_d1
        FROM embeddings
        WHERE CAST(embedding[1] AS DOUBLE) BETWEEN {_EMB_D0_LO} AND {_EMB_D0_HI}
          AND CAST(embedding[2] AS DOUBLE) BETWEEN {_EMB_D1_LO} AND {_EMB_D1_HI}
    """,
    "returned_items_pruned_scan": """
        SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY 1
    """,
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
    "q6_pruned_scan": """
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(coalesce(round(sum(CAST(l_extendedprice * l_discount
                                            AS DECIMAL(18,4))), 2), 0.0)
                    AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q19_pruned_scan": """
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(coalesce(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                            AS DECIMAL(18,4))), 2), 0.0)
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 26 AND 36)
    """,
}

QUERIES = {
    "lineitem_pruned_scan": lineitem_pruned_scan,
    "q6_pruned_scan": q6_pruned_scan,
    "q19_pruned_scan": q19_pruned_scan,
    "returned_items_pruned_scan": returned_items_pruned_scan,
    "embedding_box_scan": embedding_box_scan,
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
        domain = "string" if isinstance(lo, str) else "double"
        df = df.filter(
            (F.col(c).cast(domain) >= _bound(lo))
            & (F.col(c).cast(domain) <= _bound(hi))
        )
    return df

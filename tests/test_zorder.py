"""Z-order layout: Morton codes are correct, and the clustered layout
demonstrably skips data at the scan for 2-D box predicates."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from samza_hello_samza_spark.sources import zorder


def _scan_rows_for(spark, path, predicate):
    """Rows the parquet scan actually emitted (post file/row-group
    pruning, pre-Filter) for `predicate` — AQE disabled so the
    executed plan's scan leaf carries the metric directly."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = spark.read.parquet(path).filter(predicate)
        df.collect()
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return leaf.metrics().get("numOutputRows").get().value()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_interleave_bit_math(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long"
    ).select(zorder._interleave(F.col("a"), F.col("b"), 4).alias("z"))
    # a bits land at odd positions, b bits at even: z(1,0)=2, z(0,1)=1,
    # z(3,5) = interleave(0b011, 0b101) = 0b011011+... compute: bits
    # a=3 (011): positions 1,3 → 0b1010; b=5 (101): positions 0,4 →
    # 0b10001 → z = 0b11011 = 27... a bit1=1→bit3, a bit0=1→bit1,
    # b bit2=1→bit4, b bit0=1→bit0 → 16+8+2+1 = 27.
    assert [r.z for r in df.collect()] == [0, 2, 1, 27]


def test_zcode_covers_both_dims(spark):
    df = spark.range(4096).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 4096).alias("y")
    )
    z = zorder.zorder_code(df, "x", "y", bits=8)
    rows = z.agg(
        F.min("_zcode").alias("lo"),
        F.max("_zcode").alias("hi"),
        F.count_distinct("_zcode").alias("n"),
    ).collect()[0]
    assert rows.lo >= 0 and rows.hi < (1 << 16)
    assert rows.n > 1000  # codes actually spread over the curve


def test_zorder_layout_prunes_box_queries(spark, tmp_path):
    """Same data, same file count, same box predicate: the Z-ordered
    layout's scan must emit far fewer rows than a layout sorted only
    by the first column (whose files can't prune on the second)."""
    n = 200_000
    df = spark.range(n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)) % 10_000).alias("u"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(0x7FFFFFFF)) % 100_000).alias("v"),
    )
    natural = os.path.join(str(tmp_path), "by_u")
    zed = os.path.join(str(tmp_path), "zorder")
    (
        df.repartitionByRange(64, "u")
        .sortWithinPartitions("u")
        .write.mode("overwrite")
        .parquet(natural)
    )
    zorder.write_zordered(df, zed, "u", "v", files=64)

    # box broad on u (30%) and narrow on v (1%): the u-sorted layout
    # must keep ~30% of its files and can't prune v inside them; the
    # z-ordered layout prunes on BOTH dims. (When the first dim alone
    # is ultra-selective, single-column sort wins — that's expected
    # and is why zorder targets multi-dim predicates.)
    pred = (
        (F.col("u") >= 2000) & (F.col("u") < 5000)
        & (F.col("v") >= 50_000) & (F.col("v") < 51_000)
    )
    expected = df.filter(pred).count()
    rows_natural = _scan_rows_for(spark, natural, pred)
    rows_z = _scan_rows_for(spark, zed, pred)
    # identical answers first
    assert (
        spark.read.parquet(zed).filter(pred).count()
        == spark.read.parquet(natural).filter(pred).count()
        == expected
    )
    assert rows_z < rows_natural * 0.5, (rows_z, rows_natural)

    # filter on the SECOND dim alone: u-sorted layout reads ~everything,
    # z-ordered layout still skips most files.
    pred_v = (F.col("v") >= 50_000) & (F.col("v") < 51_000)
    rows_natural_v = _scan_rows_for(spark, natural, pred_v)
    rows_z_v = _scan_rows_for(spark, zed, pred_v)
    assert rows_z_v < rows_natural_v * 0.5, (rows_z_v, rows_natural_v)

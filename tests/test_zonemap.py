"""Zone maps: file-skipping is exact, effective on clustered layout,
and incrementally maintainable after appends."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from samza_hello_samza_spark.sources import zonemap, zorder


def _dataset(spark, n=100_000):
    return spark.range(n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)) % 10_000).alias("u"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(0x7FFFFFFF)) % 100_000).alias("v"),
        F.col("id").alias("row_id"),
    )


def test_zonemap_read_equals_full_scan_and_prunes(spark, tmp_path):
    """On a z-ordered layout the zone map must (a) return exactly the
    full-scan filter result and (b) open only a fraction of the files
    for a selective 2-D box."""
    path = os.path.join(str(tmp_path), "zed")
    zorder.write_zordered(_dataset(spark), path, "u", "v", files=32)
    zonemap.build_zonemap(spark, path, ["u", "v"])

    ranges = {"u": (1000.0, 1999.0), "v": (20000.0, 29999.0)}
    got = sorted(
        r.row_id for r in zonemap.zonemap_read(spark, path, ranges).collect()
    )
    want = sorted(
        r.row_id
        for r in spark.read.parquet(path)
        .filter(
            (F.col("u").between(1000, 1999)) & (F.col("v").between(20000, 29999))
        )
        .collect()
    )
    assert got == want and got

    all_files = zonemap.pruned_files(
        spark, path, {"u": (0.0, 1e12)}
    )
    kept = zonemap.pruned_files(spark, path, ranges)
    assert len(kept) < len(all_files) / 2, (
        f"zone map pruned nothing: {len(kept)}/{len(all_files)} files"
    )


def test_zonemap_conservative_on_random_layout(spark, tmp_path):
    """Random layout → every file overlaps every range: the zone map
    prunes ~nothing but results stay exact (conservatism, not luck)."""
    path = os.path.join(str(tmp_path), "rand")
    _dataset(spark, 50_000).repartition(16).write.parquet(path)
    zonemap.build_zonemap(spark, path, ["u"])
    ranges = {"u": (100.0, 199.0)}
    got = sorted(
        r.row_id for r in zonemap.zonemap_read(spark, path, ranges).collect()
    )
    want = sorted(
        r.row_id
        for r in spark.read.parquet(path).filter(F.col("u").between(100, 199)).collect()
    )
    assert got == want and got


def test_zonemap_empty_result_range(spark, tmp_path):
    path = os.path.join(str(tmp_path), "zed")
    zorder.write_zordered(_dataset(spark, 20_000), path, "u", "v", files=8)
    zonemap.build_zonemap(spark, path, ["u"])
    assert zonemap.pruned_files(spark, path, {"u": (1e9, 2e9)}) == []
    assert zonemap.zonemap_read(spark, path, {"u": (1e9, 2e9)}).count() == 0


def test_zonemap_refresh_after_append(spark, tmp_path):
    """Appended files fold in at delta cost and become skippable /
    findable immediately; pre-existing stats rows are not recomputed."""
    path = os.path.join(str(tmp_path), "tbl")
    _dataset(spark, 20_000).write.parquet(path)
    zonemap.build_zonemap(spark, path, ["u"])
    n0 = spark.read.parquet(zonemap._stats_dir(path)).count()

    # append a batch living entirely in a new value region
    spark.range(1000).select(
        (F.col("id") + 1_000_000).alias("u"),
        F.col("id").alias("v"),
        (F.col("id") + 10_000_000).alias("row_id"),
    ).write.mode("append").parquet(path)

    added = zonemap.refresh_new_files(spark, path, ["u"])
    assert added >= 1
    stats = spark.read.parquet(zonemap._stats_dir(path))
    assert stats.count() == n0 + added

    # the new region is found, and only via the appended files
    hits = zonemap.zonemap_read(
        spark, path, {"u": (1_000_000.0, 2_000_000.0)}
    ).count()
    assert hits == 1000
    kept = zonemap.pruned_files(spark, path, {"u": (1_000_000.0, 2_000_000.0)})
    assert len(kept) == added


def test_lineitem_pruned_scan_actually_skips_files(spark):
    """The registered probe must read a strict subset of the layout's
    files for its box — the zone map is load-bearing, not decorative."""
    from tests.conftest import SF_DIR

    table_dir = zonemap._zordered_lineitem(spark, SF_DIR)
    all_files = zonemap.pruned_files(
        spark, table_dir, {"l_extendedprice": (0.0, 1e12)}
    )
    kept = zonemap.pruned_files(
        spark,
        table_dir,
        {
            "l_extendedprice": (zonemap.PRICE_LO, zonemap.PRICE_HI),
            "l_quantity": (zonemap.QTY_LO, zonemap.QTY_HI),
        },
    )
    assert 0 < len(kept) < len(all_files) / 2, (len(kept), len(all_files))


# -- property-based conservatism (hypothesis) --------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @given(
        ranges=st.lists(
            st.tuples(
                st.sampled_from(["u", "v"]),
                st.integers(0, 100_000),
                st.integers(0, 100_000),
            ),
            min_size=1,
            max_size=2,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_zonemap_read_always_equals_full_scan(
        spark, tmp_path_factory, ranges
    ):
        """For ANY box (including empty and inverted ranges collapsing
        to nothing), the pruned read equals the full-scan filter —
        conservatism is unconditional, not layout luck."""
        import os
        import tempfile

        global _ZM_SHARED
        try:
            path = _ZM_SHARED
        except NameError:
            path = os.path.join(
                tempfile.mkdtemp(dir=str(tmp_path_factory.getbasetemp())), "t"
            )
            zorder.write_zordered(_dataset(spark, 30_000), path, "u", "v", files=8)
            zonemap.build_zonemap(spark, path, ["u", "v"])
            _ZM_SHARED = path

        box = {}
        for col, a, b in ranges:
            box[col] = (float(min(a, b)), float(max(a, b)))
        got = sorted(
            r.row_id for r in zonemap.zonemap_read(spark, path, box).collect()
        )
        df = spark.read.parquet(path)
        for col, (lo, hi) in box.items():
            df = df.filter(F.col(col).between(lo, hi))
        want = sorted(r.row_id for r in df.collect())
        assert got == want

"""Data-quality report: oracle match + checks detect injected defects."""

from __future__ import annotations

from samza_hello_samza_spark.plans import quality_checks
from tests.conftest import SF_DIR, assert_matches_oracle


def test_oracle_match(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        quality_checks.QUERIES["data_quality_report"],
        quality_checks.ORACLES["data_quality_report"],
    )


def test_clean_testdata_passes_all_checks(spark):
    rows = quality_checks.data_quality_report(spark, SF_DIR).collect()
    assert len(rows) == 13
    for r in rows:
        assert r.passed == 1 and r.n_bad == 0, r
        assert r.n_total > 0, r


def test_checks_catch_injected_defects(spark, tmp_path, monkeypatch):
    """Corrupt a copy of the warehouse (orphan FK rows, a duplicate PK,
    a negative price, a null user) — every corresponding check must
    flip to failed with the right violation count."""
    import shutil

    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import TABLES, load_table

    bad_dir = str(tmp_path / "bad_sf")
    import os

    os.makedirs(bad_dir)
    for t in TABLES:
        if t in ("orders", "events"):
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{bad_dir}/{t}.parquet")

    orders = load_table(spark, SF_DIR, "orders")
    first = orders.limit(1)
    corrupted_orders = (
        orders
        # orphan custkey → fk_orders_customer
        .unionByName(first.withColumn("o_custkey", F.lit(99_999_999)))
        # duplicate orderkey (the union row above also duplicates its
        # o_orderkey) and a negative price → totalprice_positive
        .unionByName(first.withColumn("o_totalprice", F.lit(-5.0)))
    )
    corrupted_orders.coalesce(1).write.parquet(f"{bad_dir}/orders.parquet")
    ev = load_table(spark, SF_DIR, "events")
    ev.unionByName(
        ev.limit(1).withColumn("user_id", F.lit(None).cast("long"))
    ).coalesce(1).write.parquet(f"{bad_dir}/events.parquet")

    got = {
        (r.check, r.tbl): r
        for r in quality_checks.data_quality_report(spark, bad_dir).collect()
    }
    assert got[("fk_orders_customer", "orders")].n_bad == 1
    assert got[("totalprice_positive", "orders")].n_bad == 1
    assert got[("pk_unique", "orders")].n_bad == 2  # two extra copies of one key
    assert got[("user_id_not_null", "events")].n_bad == 1
    assert got[("pk_unique", "part")].passed == 1  # untouched table still clean

"""Statistical plans hash-match their DuckDB oracles + invariants."""

from __future__ import annotations

import math

import pytest

from samza_hello_samza_spark.plans import stats
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(stats.QUERIES))
def test_oracle_match(spark, duck, name):
    assert name in stats.ORACLES, f"{name} missing oracle"
    assert_matches_oracle(spark, duck, stats.QUERIES[name], stats.ORACLES[name])


def test_order_size_distribution_accounts_for_every_order(spark):
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import load_table

    rows = stats.order_size_distribution(spark, SF_DIR).collect()
    n_orders = sum(r.n_orders for r in rows)
    n_lines = sum(r.n_lines * r.n_orders for r in rows)
    li = load_table(spark, SF_DIR, "lineitem")
    assert n_orders == li.select("l_orderkey").distinct().count()
    assert n_lines == li.count()


def test_hhi_bounds(spark):
    """1/n_suppliers ≤ HHI ≤ 1, and top_share² ≤ HHI."""
    for r in stats.supplier_concentration_hhi(spark, SF_DIR).collect():
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-6, r
        assert r.top_share * r.top_share <= r.hhi + 1e-6, r


def test_entropy_bounds(spark):
    """0 ≤ H ≤ ln(n_types); single-type users have exactly H = 0."""
    for r in stats.user_event_entropy(spark, SF_DIR).collect():
        assert -1e-9 <= r.entropy <= math.log(r.n_types) + 1e-6, r
        if r.n_types == 1:
            assert r.entropy == 0.0, r


def test_regression_reconstructs_series_mean(spark):
    """Least squares passes through (x̄, ȳ): slope·x̄ + intercept ≈ ȳ."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.functions.hints import maybe_broadcast
    from samza_hello_samza_spark.session import load_table

    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    monthly = (
        orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2
            ).alias("y")
        )
    )
    means = {
        r.n_name: (r.xb, r.yb)
        for r in monthly.groupBy("n_name")
        .agg(F.avg("x").alias("xb"), F.avg("y").alias("yb"))
        .collect()
    }
    for r in stats.revenue_trend_regression(spark, SF_DIR).collect():
        xb, yb = means[r.n_name]
        assert abs(r.slope * xb + r.intercept - yb) / abs(yb) < 0.01, r


def test_moments_agree_with_numpy(spark):
    import numpy as np

    from samza_hello_samza_spark.session import load_table

    vals = {}
    for r in load_table(spark, SF_DIR, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for r in stats.value_moments(spark, SF_DIR).collect():
        x = np.asarray(vals[r.event_type])
        assert abs(r.mean - x.mean()) < 1e-3
        assert abs(r.variance - x.var()) < 1e-1
        skew = ((x - x.mean()) ** 3).mean() / x.var() ** 1.5
        assert abs(r.skewness - skew) < 1e-2


def test_dispersion_index_positive(spark):
    r = stats.orders_dispersion(spark, SF_DIR).collect()[0]
    assert r.n_days > 0 and r.mean_daily_orders > 0
    assert r.dispersion_index >= 0


def test_segment_migration_partitions_customers(spark):
    """Every customer appears in exactly one matrix cell; totals add up."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import load_table

    rows = stats.segment_migration(spark, SF_DIR).collect()
    n_total = sum(r.n_customers for r in rows)
    n_cust = (
        load_table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert n_total == n_cust
    assert all(r.seg_from != "none" or r.seg_to != "none" for r in rows)


def test_benford_shares_sum_to_one(spark):
    rows = stats.benford_deviation(spark, SF_DIR).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_expected for r in rows) - 1.0) < 1e-3


def test_mad_outliers_robust_to_injection(spark, tmp_path):
    """Planting one absurd price must not move the median/MAD much but
    must raise that type's outlier count."""
    import shutil

    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import TABLES, load_table

    before = {r.p_type: r for r in stats.price_mad_outliers(spark, SF_DIR).collect()}
    bad_dir = str(tmp_path / "mad_sf")
    import os

    os.makedirs(bad_dir)
    for t in TABLES:
        if t != "lineitem":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{bad_dir}/{t}.parquet")
    li = load_table(spark, SF_DIR, "lineitem")
    spiked = li.unionByName(
        li.limit(1).withColumn("l_extendedprice", F.lit(1e9))
    )
    spiked.coalesce(1).write.parquet(f"{bad_dir}/lineitem.parquet")
    target_type = load_table(spark, SF_DIR, "part").join(
        li.limit(1), F.col("p_partkey") == F.col("l_partkey")
    ).collect()[0].p_type

    after = {r.p_type: r for r in stats.price_mad_outliers(spark, bad_dir).collect()}
    b, a = before[target_type], after[target_type]
    assert a.n_outliers == b.n_outliers + 1
    assert abs(a.median_price - b.median_price) / b.median_price < 0.01


def test_chi2_nonnegative_and_dof(spark):
    r = stats.priority_mix_chi2(spark, SF_DIR).collect()[0]
    assert r.chi2 >= 0
    assert r.dof >= 1
    assert r.n_orders > 0


def test_cusum_detects_injected_level_shift(spark, tmp_path):
    """Doubling every value after a chosen day must move the detected
    change point to (or near) that day for every event type."""
    import shutil

    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import TABLES, load_table

    ev = load_table(spark, SF_DIR, "events")
    day = (F.unix_timestamp("ts") / 86400).cast("bigint")
    days = sorted(r.d for r in ev.select(day.alias("d")).distinct().collect())
    shift_day = days[len(days) // 2]
    shifted = ev.withColumn(
        "value", F.when(day >= shift_day, F.col("value") * 10).otherwise(F.col("value"))
    )
    bad_dir = str(tmp_path / "cusum_sf")
    import os

    os.makedirs(bad_dir)
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{bad_dir}/{t}.parquet")
    shifted.coalesce(1).write.parquet(f"{bad_dir}/events.parquet")

    idx = {d: i for i, d in enumerate(days)}
    for r in stats.daily_cusum_changepoint(spark, bad_dir).collect():
        # CUSUM's |max| sits AT the boundary day (±2 days tolerance)
        assert abs(idx[r.change_day] - idx[shift_day]) <= 2, r


def test_ab_test_report_properties(spark):
    """Two arms; antisymmetric z; Wilson interval brackets the rate
    and sits inside [0,1]; counts consistent."""
    from samza_hello_samza_spark.plans.stats import ab_test_report
    from tests.conftest import SF_DIR

    rows = {r.arm: r for r in ab_test_report(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    assert abs(rows[0].z_vs_other + rows[1].z_vs_other) < 1e-9
    for r in rows.values():
        assert 0 < r.n_converters < r.n_users  # non-degenerate metric
        assert 0.0 <= r.wilson_lo <= r.conv_rate <= r.wilson_hi <= 1.0

"""Materialized-view correctness: serving, sketches, incremental refresh."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.plans import matview
from samza_hello_samza_spark.session import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.fixture()
def events(spark):
    return load_table(spark, SF_DIR, "events")


@pytest.fixture()
def tmp_mv():
    d = tempfile.mkdtemp(prefix="mv_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_mv_oracle_match(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        matview.QUERIES["mv_event_type_stats"],
        matview.ORACLES["mv_event_type_stats"],
    )


def test_mv_daily_rollup_equals_fact_scan(spark, events, tmp_mv):
    matview.build_mv(spark, events, tmp_mv)
    served = {
        r.day: (r.n_events, float(r.sum_value))
        for r in matview.serve_rollup(spark, tmp_mv, "day").collect()
    }
    direct = {
        r.day: (r.n_events, float(r.sum_value))
        for r in events.groupBy(
            (F.unix_timestamp("ts") / 86400).cast("bigint").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .collect()
    }
    assert served == direct  # decimal sums: EXACT equality, any partitioning


def test_mv_hll_users_within_5pct(spark, events, tmp_mv):
    matview.build_mv(spark, events, tmp_mv)
    est = {
        r.event_type: r.users_est
        for r in matview.serve_rollup(spark, tmp_mv, "event_type").collect()
    }
    exact = {
        r.event_type: r.u
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for et, u in exact.items():
        assert abs(est[et] - u) / u <= 0.05, (et, est[et], u)


def test_mv_incremental_refresh_equals_rebuild(spark, events, tmp_mv):
    """Build on the first half of days, refresh with the second half
    PLUS an overlapping day (exercises the merge of an existing
    partition) — must equal a from-scratch build, exactly."""
    day = (F.unix_timestamp("ts") / 86400).cast("bigint")
    days = sorted(r.d for r in events.select(day.alias("d")).distinct().collect())
    split = days[len(days) // 2]
    base = events.filter(day < split)
    delta = events.filter(day >= split)
    assert base.count() and delta.count()

    matview.build_mv(spark, base, tmp_mv)
    refreshed_days = matview.refresh_mv(spark, tmp_mv, delta)
    assert refreshed_days == [d for d in days if d >= split]

    rebuilt_dir = tmp_mv + "_rebuild"
    try:
        matview.build_mv(spark, events, rebuilt_dir)
        a = {
            (r.day, r.event_type): (r.n_events, float(r.sum_value))
            for r in spark.read.parquet(tmp_mv).collect()
        }
        b = {
            (r.day, r.event_type): (r.n_events, float(r.sum_value))
            for r in spark.read.parquet(rebuilt_dir).collect()
        }
        assert a == b
        # HLL estimates agree grain-by-grain too (disjoint-data union)
        ea = {
            r.day: r.users_est
            for r in matview.serve_rollup(spark, tmp_mv, "day").collect()
        }
        eb = {
            r.day: r.users_est
            for r in matview.serve_rollup(spark, rebuilt_dir, "day").collect()
        }
        for d in eb:
            assert abs(ea[d] - eb[d]) <= max(1.0, 0.02 * eb[d]), d
    finally:
        shutil.rmtree(rebuilt_dir, ignore_errors=True)


def test_mv_refresh_prunes_to_touched_days(spark, events, tmp_mv):
    """The merge's MV read must partition-prune to the delta's days —
    refresh cost is O(delta), not O(history)."""
    day = (F.unix_timestamp("ts") / 86400).cast("bigint")
    days = sorted(r.d for r in events.select(day.alias("d")).distinct().collect())
    matview.build_mv(spark, events, tmp_mv)
    one_day = days[-1]
    pruned = spark.read.parquet(tmp_mv).filter(F.col("day").isin([one_day]))
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(rf"PartitionFilters: \[[^\]]*day#\d+ = {one_day}", plan), plan[:1500]
    # and the scan really reads 1 of N day partitions
    n_days_read = pruned.select("day").distinct().count()
    assert n_days_read == 1
    # end-to-end: refreshing one day's worth of rows changes only that day
    delta = events.filter(day == one_day).limit(50)
    before = {
        (r.day, r.event_type): r.n_events for r in spark.read.parquet(tmp_mv).collect()
    }
    refreshed = matview.refresh_mv(spark, tmp_mv, delta)
    assert refreshed == [one_day]
    after = {
        (r.day, r.event_type): r.n_events for r in spark.read.parquet(tmp_mv).collect()
    }
    for key, n in after.items():
        if key[0] != one_day:
            assert before[key] == n, key


def test_streaming_mv_refresh_matches_rebuild(spark, events, tmp_mv, tmp_path):
    """Live MV maintenance: stream the events table through
    mv_refresh_job in several micro-batches — the maintained MV must
    equal a from-scratch build, and a redelivered batch must not fold
    twice (marker-file idempotence)."""
    from samza_hello_samza_spark.streaming import maintenance

    src_dir = str(tmp_path / "stream_src")
    # several files → several micro-batches (maxFilesPerTrigger=1)
    events.repartition(3).write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src_dir)
    ckpt = str(tmp_path / "ckpt")
    q = maintenance.mv_refresh_job(stream, tmp_mv, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rebuilt = tmp_mv + "_rebuild"
    try:
        matview.build_mv(spark, events, rebuilt)
        a = {
            (r.day, r.event_type): (r.n_events, float(r.sum_value))
            for r in spark.read.parquet(tmp_mv).collect()
        }
        b = {
            (r.day, r.event_type): (r.n_events, float(r.sum_value))
            for r in spark.read.parquet(rebuilt).collect()
        }
        assert a == b
    finally:
        shutil.rmtree(rebuilt, ignore_errors=True)

    # redelivery: re-running an applied batch id is a no-op
    import os

    applied = sorted(os.listdir(os.path.join(ckpt, "_applied")))
    assert applied  # at least one batch folded
    batch_id = int(applied[0].split("-")[1])
    before = {
        (r.day, r.event_type): r.n_events for r in spark.read.parquet(tmp_mv).collect()
    }
    assert os.path.exists(os.path.join(ckpt, "_applied", f"batch-{batch_id}"))
    # a second job on the same checkpoint: Spark's checkpoint replays
    # nothing new, and the marker files guard anything re-handed.
    q2 = maintenance.mv_refresh_job(
        spark.readStream.schema(events.schema).parquet(src_dir), tmp_mv, ckpt
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    after = {
        (r.day, r.event_type): r.n_events for r in spark.read.parquet(tmp_mv).collect()
    }
    assert after == before

"""Incremental aggregate maintenance: deltas merge to the full answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from samza_hello_samza_spark.session import load_table
from samza_hello_samza_spark.sources import incremental
from tests.conftest import SF_DIR


def test_two_deltas_equal_full_recompute(spark, tmp_path):
    state = str(tmp_path / "state")
    ev = load_table(spark, SF_DIR, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    incremental.update_aggregate(spark, state, first)
    incremental.update_aggregate(spark, state, second)

    got = {
        r.user_id: (r.n_events, r.total_value, r.avg_value)
        for r in incremental.read_aggregate(spark, state).collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value, r.avg_value)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.sum("value") / F.count("*"), 6).alias("avg_value"),
        )
        .collect()
    }
    assert got == want


def test_replaying_empty_delta_is_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    ev = load_table(spark, SF_DIR, "events")
    incremental.update_aggregate(spark, state, ev)
    before = sorted(tuple(r) for r in incremental.read_aggregate(spark, state).collect())
    incremental.update_aggregate(spark, state, ev.filter(F.lit(False)))
    after = sorted(tuple(r) for r in incremental.read_aggregate(spark, state).collect())
    assert before == after


def test_distinct_sketch_merges_like_full_recompute(spark, tmp_path):
    """HLL state folded over two deltas must estimate the same distinct
    counts as one sketch over the full data (sketch merge is lossless
    w.r.t. the union), and at this tiny cardinality (≤5 event types)
    the estimate is exact."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import load_table
    from samza_hello_samza_spark.sources.incremental import (
        read_distinct_estimate,
        update_distinct_sketch,
    )
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    d1 = events.filter(F.col("event_id") % 2 == 0)
    d2 = events.filter(F.col("event_id") % 2 == 1)
    state = str(tmp_path / "hll_state")
    update_distinct_sketch(spark, state, d1)
    update_distinct_sketch(spark, state, d2)

    got = {r.user_id: r.n_distinct_est for r in read_distinct_estimate(spark, state).collect()}
    want = {
        r.user_id: r.nd
        for r in events.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("nd"))
        .collect()
    }
    assert got == want

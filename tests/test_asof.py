"""As-of join semantics: inclusive match, carry-forward, null before first."""

from __future__ import annotations

import datetime as dt

from samza_hello_samza_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2020, 1, 1, 0, 0, s)


def test_bucketed_range_join_matches_naive(spark):
    """The bucket-equi-join plan returns exactly the naive range join."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.operators.asof import bucketed_range_join
    from samza_hello_samza_spark.session import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select("event_id", "value")
    intervals = spark.createDataFrame(
        [(i, 7.0 * i, 7.0 * i + 23.0) for i in range(40)], "iv_id int, lo double, hi double"
    )
    fast = bucketed_range_join(ev, "value", intervals, "lo", "hi", bucket_width=10.0)
    naive = ev.crossJoin(intervals).filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    )
    key = lambda r: (r.event_id, r.iv_id)  # noqa: E731
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))


def test_asof_join_edge_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "e1"), (1, _ts(10), "e2"), (1, _ts(2), "e0"), (2, _ts(7), "e3")],
        "k int, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100), (1, _ts(8), 200), (3, _ts(1), 999)],
        "k int, rt timestamp, val int",
    )
    got = {
        r.name: r.val
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt", value_cols=["val"]
        ).collect()
    }
    assert got["e1"] == 100      # equal timestamp matches (inclusive)
    assert got["e2"] == 200      # latest preceding, not first
    assert got["e0"] is None     # nothing at-or-before
    assert got["e3"] is None     # key with no right rows at all

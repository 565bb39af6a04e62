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


def test_bucketed_interval_join_matches_naive_overlap(spark):
    """First-shared-bucket dedup is exact: the bucketized overlap join
    equals the naive non-equi overlap join on intervals that span
    multiple buckets, share buckets without overlapping, and tie at
    closed endpoints."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.operators.asof import bucketed_interval_join

    left = spark.createDataFrame(
        [  # (key, id, lo, hi)
            (1, "a", 0, 250),     # spans buckets 0,1,2 (width 100)
            (1, "b", 90, 110),    # straddles a bucket edge
            (1, "c", 400, 410),   # overlaps nothing
            (2, "d", 0, 1000),    # long interval, other key
        ],
        "k int, lid string, l_lo long, l_hi long",
    )
    right = spark.createDataFrame(
        [
            (1, "x", 240, 260),   # overlaps a at its tail (shared bucket 2)
            (1, "y", 250, 300),   # closed-endpoint tie with a (250 == 250)
            (1, "z", 111, 190),   # same bucket as b but NO overlap
            (2, "w", 999, 1500),  # tail overlap across many buckets
        ],
        "k int, rid string, r_lo long, r_hi long",
    )
    got = sorted(
        (r.k, r.lid, r.rid)
        for r in bucketed_interval_join(
            left, "l_lo", "l_hi", right, "r_lo", "r_hi", ["k"], 100
        ).collect()
    )
    naive = sorted(
        (r.k, r.lid, r.rid)
        for r in left.join(right, "k")
        .filter((F.col("l_lo") <= F.col("r_hi")) & (F.col("r_lo") <= F.col("l_hi")))
        .collect()
    )
    assert got == naive
    assert ("1", "b", "z") not in got  # shared bucket but disjoint
    assert (1, "a", "y") in got        # closed-endpoint tie counts


def test_session_order_overlap_bounds(spark):
    from samza_hello_samza_spark.operators.asof import (
        DAY_SEC,
        ORDER_WINDOW_DAYS,
        session_order_overlap,
    )
    from tests.conftest import SF_DIR

    rows = session_order_overlap(spark, SF_DIR).collect()
    assert rows
    # each (session, order) pair appears exactly once (bucket dedup)
    keys = [(r.user_id, r.session_id, r.o_orderkey) for r in rows]
    assert len(keys) == len(set(keys))
    for r in rows:
        assert 0 <= r.overlap_seconds <= ORDER_WINDOW_DAYS * DAY_SEC


def test_asof_join_forward_semantics(spark):
    """Forward as-of: earliest right at-or-after, inclusive at equality,
    null after the last right row, tolerance nulls far matches."""
    from samza_hello_samza_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(10), "b"), (1, _ts(30), "c"), (2, _ts(5), "d")],
        "k int, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 200)],
        "k int, rts timestamp, val int",
    )
    got = {
        r.tag: r.val
        for r in asof_join_forward(
            left, right, "k", "lts", "rts", ["val"]
        ).collect()
    }
    assert got == {"a": 100, "b": 100, "c": None, "d": None}
    # tolerance 5s: "a"'s match at +10s is beyond it
    got_tol = {
        r.tag: r.val
        for r in asof_join_forward(
            left, right, "k", "lts", "rts", ["val"], tolerance_s=5
        ).collect()
    }
    assert got_tol == {"a": None, "b": 100, "c": None, "d": None}


def test_asof_next_order_matches_model(spark):
    """Brute-force per-event model over the real tables."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.operators.asof import (
        FORWARD_TOL_DAYS,
        asof_next_order,
    )
    from samza_hello_samza_spark.session import load_table
    from tests.conftest import SF_DIR

    orders = {}
    for r in (
        load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("k"))
        .collect()
    ):
        orders.setdefault(r.o_custkey, []).append(
            (dt.datetime.combine(r.o_orderdate, dt.time()), r.k)
        )
    for v in orders.values():
        v.sort()
    got = {r.event_id: r.next_orderkey for r in asof_next_order(spark, SF_DIR).collect()}
    events = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts").collect()
    assert got and len(got) == len(events)
    tol = dt.timedelta(days=FORWARD_TOL_DAYS)
    for e in events:
        want = -1
        for ots, okey in orders.get(e.user_id, ()):
            if ots >= e.ts:
                want = okey if ots <= e.ts + tol else -1
                break
        assert got[e.event_id] == want, e.event_id

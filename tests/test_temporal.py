"""Temporal plans hash-match their DuckDB oracles at sf0.001, plus
semantic invariants (rollup level algebra, chunk-dedup first-keep)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.operators import dedup
from samza_hello_samza_spark.plans import temporal
from tests.conftest import SF_DIR, assert_matches_oracle


#: sketch-based, no exact SQL twin — accuracy asserted separately.
NO_ORACLE = {"rolling_active_users_approx"}


@pytest.mark.parametrize("name", sorted(set(temporal.QUERIES) - NO_ORACLE))
def test_oracle_match(spark, duck, name):
    assert name in temporal.ORACLES, f"{name} missing oracle"
    assert_matches_oracle(
        spark, duck, temporal.QUERIES[name], temporal.ORACLES[name]
    )


def test_chunk_dedup_oracle(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        dedup.QUERIES["dedup_chunk_exact"],
        dedup.ORACLES["dedup_chunk_exact"],
    )


def test_rollup_levels_are_consistent(spark):
    """Each rollup level must re-aggregate to the same grand total,
    and the grand-total row (lvl=7) must count every event."""
    df = temporal.events_time_rollup(spark, SF_DIR).cache()
    try:
        totals = {
            r.lvl: r.n
            for r in df.groupBy("lvl").agg(F.sum("n_events").alias("n")).collect()
        }
        # lvl 0 = (day,hour,minute), 1 = (day,hour), 3 = (day), 7 = ()
        assert set(totals) == {0, 1, 3, 7}
        assert len(set(totals.values())) == 1, totals
        grand = df.filter(F.col("lvl") == 7).collect()
        assert len(grand) == 1
        assert grand[0].day == -1 and grand[0].minute == -1
    finally:
        df.unpersist()


def test_top_events_per_user_k_and_order(spark):
    rows = temporal.top_events_per_user(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.rnk)
        assert 1 <= len(rs) <= temporal.TOP_K
        vals = [r.value for r in rs]
        assert vals == sorted(vals, reverse=True), (user, vals)


def test_rolling_hll_within_five_pct_of_exact(spark):
    exact = {
        r.day: r.active_users_7d
        for r in temporal.rolling_active_users(spark, SF_DIR).collect()
    }
    approx = {
        r.day: r.active_users_7d
        for r in temporal.rolling_active_users_approx(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.05 * n), (day, n, approx[day])


def test_equidepth_buckets_are_balanced(spark):
    """Equi-depth means bucket populations within interpolation slack
    of n/k, and bucket ranges must tile without overlap."""
    rows = sorted(
        temporal.price_equidepth_histogram(spark, SF_DIR).collect(),
        key=lambda r: r.bucket,
    )
    n = sum(r.n_items for r in rows)
    k = temporal.EQUIDEPTH_NBUCKETS
    assert [r.bucket for r in rows] == list(range(1, k + 1))
    for r in rows:
        assert abs(r.n_items - n / k) <= max(3, 0.02 * n), r
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo, (a, b)


def test_chunk_dedup_keeps_first_occurrence_only(spark):
    """Synthetic corpus: doc 0 and doc 2 share an identical 10-word
    chunk; only doc 0 (the first occurrence) may keep it."""
    k = dedup.CHUNK_WORDS
    shared = " ".join(f"w{i}" for i in range(k))
    uniq_a = " ".join(f"a{i}" for i in range(k))
    uniq_b = " ".join(f"b{i}" for i in range(k))
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs = spark.createDataFrame(
            [
                (0, f"{shared} {uniq_a}", "en", "syn", 0),
                (1, uniq_b, "en", "syn", 0),
                (2, f"{uniq_b} {shared}", "en", "syn", 0),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r.doc_id: r for r in dedup.dedup_chunk_exact(spark, td).collect()
        }
        assert out[0].clean_text == f"{shared} {uniq_a}"
        assert out[0].n_kept == 2
        # doc 1 owns uniq_b (first occurrence beats doc 2's copy)
        assert out[1].clean_text == uniq_b
        # doc 2 loses BOTH chunks → empty text, zero kept
        assert out[2].clean_text == ""
        assert (out[2].n_chunks, out[2].n_kept) == (2, 0)


def test_backlog_conserves_and_never_goes_negative(spark):
    """The running backlog is a conservation law: at every day it
    equals cumulative opens minus cumulative closes, never dips below
    zero, and drains to zero after the last close."""
    rows = sorted(
        temporal.orders_open_backlog(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    running = 0
    for r in rows:
        running += r.opened - r.closed
        assert r.open_orders == running, r
        assert running >= 0, r
    assert rows[-1].open_orders == 0
    assert sum(r.opened for r in rows) == sum(r.closed for r in rows)


def test_pareto_deciles_partition_and_shares_sum_to_one(spark):
    """Deciles must cover every revenue-bearing customer exactly once,
    shares must sum to ~1, and revenue must concentrate: the top
    decile's share strictly exceeds the bottom decile's."""
    rows = sorted(
        temporal.customer_pareto_curve(spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, temporal.PARETO_NBUCKETS + 1))
    assert abs(sum(r.rev_share for r in rows) - 1.0) < 1e-4
    n = sum(r.n_customers for r in rows)
    for r in rows:
        # equi-depth within interpolation slack
        assert abs(r.n_customers - n / temporal.PARETO_NBUCKETS) <= max(3, 0.02 * n), r
    assert rows[-1].rev_share > rows[0].rev_share


def test_window_funnel_deadline_semantics(spark, tmp_path):
    """Synthetic 3-user corpus pins the hop rules: complete-in-time →
    stage 3; click past the deadline never qualifies (so a later
    purchase can't complete either) → stage 1; and the click deadline
    measures from the LATEST view (last-touch), so a stale first view
    is rescued by a fresh second one → stage 2."""
    import os

    T = temporal.FUNNEL_WINDOW_S
    rows = [
        # user 100: view → click (+10s) → purchase (+20s): stage 3
        (1, 100, "view", 1000),
        (2, 100, "click", 1000 + 10),
        (3, 100, "purchase", 1000 + 20),
        # user 200: click one second PAST the deadline — unqualified,
        # and the prompt purchase after it must NOT complete: stage 1
        (4, 200, "view", 1000),
        (5, 200, "click", 1000 + T + 1),
        (6, 200, "purchase", 1000 + T + 2),
        # user 300: stale first view, but a SECOND view rescues the
        # click (deadline from the latest view); no purchase: stage 2
        (7, 300, "view", 1000),
        (8, 300, "view", 1000 + T + 500),
        (9, 300, "click", 1000 + T + 600),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec long"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_seconds("sec").alias("ts"),
        F.lit(1.0).alias("value"),
    )
    d = str(tmp_path / "funnel")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "events.parquet"))
    hist = {
        r.stage: r.n_users
        for r in temporal.events_window_funnel(spark, d).collect()
    }
    assert hist == {3: 1, 2: 1, 1: 1}, hist


def test_gapfill_interpolates_missing_days(spark, tmp_path):
    """Remove two interior days for one type; the spine must restore
    them with observed=0 and linearly interpolated values."""
    import os

    from pyspark.sql import functions as F

    from samza_hello_samza_spark.plans.temporal import events_gapfill
    from samza_hello_samza_spark.session import load_table

    ev = load_table(spark, SF_DIR, "events")
    day = (F.unix_timestamp("ts") / 86400).cast("bigint")
    days = sorted(r.day for r in ev.select(day.alias("day")).distinct().collect())
    gap_days = days[3:5]
    victim = "view"
    pruned = ev.filter(
        ~(day.isin([int(d) for d in gap_days]) & (F.col("event_type") == victim))
    )
    gap_dir = str(tmp_path / "gapped")
    os.makedirs(gap_dir)
    pruned.write.parquet(os.path.join(gap_dir, "events.parquet"))

    out = {
        (r.event_type, r.day): (r.observed, r.value)
        for r in events_gapfill(spark, gap_dir).collect()
    }
    # full spine restored
    for d in days:
        assert (victim, d) in out
    # removed days are interpolated between the surviving neighbors
    lo, hi = days[2], days[5]
    lo_v, hi_v = out[(victim, lo)][1], out[(victim, hi)][1]
    for d in gap_days:
        observed, value = out[(victim, d)]
        assert observed == 0
        want = lo_v + (hi_v - lo_v) * (d - lo) / (hi - lo)
        assert abs(value - want) < 1e-4, (d, value, want)
    # untouched type is fully observed
    assert all(obs == 1 for (t, _d), (obs, _v) in out.items() if t != victim)


def test_redelivery_dedup_collapses_injected_bursts(spark, tmp_path):
    """Inject duplicate deliveries (same content key, seconds apart) —
    each burst must collapse to ONE kept event (the earliest) with the
    right redelivery count; a copy far outside the window starts a new
    burst."""
    from samza_hello_samza_spark.session import TABLES, load_table

    ev = load_table(spark, SF_DIR, "events")
    one = ev.orderBy("event_id").limit(1)
    dup1 = one.withColumn("event_id", F.col("event_id") + 10_000_000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 5 SECONDS")
    )
    dup2 = one.withColumn("event_id", F.col("event_id") + 20_000_000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 9 MINUTES")
    )
    late = one.withColumn("event_id", F.col("event_id") + 30_000_000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 2 DAYS")
    )
    bad_dir = str(tmp_path / "dup_sf")
    import os
    import shutil

    os.makedirs(bad_dir)
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{bad_dir}/{t}.parquet")
    ev.unionByName(dup1).unionByName(dup2).unionByName(late).coalesce(1).write.parquet(
        f"{bad_dir}/events.parquet"
    )

    orig = one.collect()[0]
    rows = [
        r
        for r in temporal.redelivery_dedup(spark, bad_dir).collect()
        if r.user_id == orig.user_id and abs(r.value - orig.value) < 1e-6
        and r.event_type == orig.event_type
    ]
    bursts = {r.burst: r for r in rows}
    assert len(bursts) == 2  # original chain + the 2-day-late copy
    first = bursts[min(bursts)]
    assert first.kept_event_id == orig.event_id
    # chain: original + dup at +5s + dup at +9min (within 10min of dup1)
    assert first.n_redeliveries == 2
    assert bursts[max(bursts)].n_redeliveries == 0


def test_time_weighted_value_hand_check(spark):
    """Recompute one user's TWA driver-side from raw events."""
    from samza_hello_samza_spark.session import load_table

    got = {r.user_id: r for r in temporal.time_weighted_value(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    uid = next(iter(sorted(got)))
    rows = sorted(
        ev.filter(F.col("user_id") == uid)
        .select(F.unix_micros("ts").alias("us"), "event_id", "value")
        .collect(),
        key=lambda r: (r.us, r.event_id),
    )
    dts = [(b.us - a.us) // 1_000_000 for a, b in zip(rows, rows[1:])]
    span = sum(dts)
    twa = sum(round(a.value, 4) * dt for a, dt in zip(rows, dts)) / span
    r = got[uid]
    assert r.n_events == len(rows)
    assert r.span_s == span
    assert abs(r.time_weighted_avg - twa) < 1e-3
    assert r.max_gap_s == max(dts)


def test_cluster_size_histogram_consistent(spark):
    """Σ(n_docs) over the histogram equals the clustered-doc count."""
    from samza_hello_samza_spark.operators import dedup as dd

    hist = dd.dedup_cluster_sizes(spark, SF_DIR).collect()
    n_docs_hist = sum(r.n_docs for r in hist)
    n_docs_direct = dd.dedup_clusters(spark, SF_DIR).count()
    assert n_docs_hist == n_docs_direct
    assert all(r.cluster_size >= 2 for r in hist)  # singletons aren't clusters


def test_rolling_median_robust_to_spike(spark):
    """The rolling median at a day NEXT TO a one-day spike must not
    move; the raw count obviously does."""
    rows = sorted(
        temporal.daily_rolling_median(spark, SF_DIR).collect(),
        key=lambda r: (r.event_type, r.day),
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    import statistics

    for et, series in by_type.items():
        for i in range(3, len(series) - 3):
            window = [series[j].n_events for j in range(i - 3, i + 4)]
            assert series[i].rolling_median == round(
                float(statistics.median(window)), 1
            ), (et, i)


def test_touch_counts_match_bruteforce(spark):
    """Per-purchase trailing-4h view counts recomputed driver-side."""
    from samza_hello_samza_spark.session import load_table

    got = {
        r.event_id: r.n_touches
        for r in temporal.purchase_touch_counts(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    n_checked = 0
    for user, rs in sorted(by_user.items())[:50]:
        for r in rs:
            if r.event_type != "purchase":
                continue
            n = sum(
                1
                for o in rs
                if o.event_type == "view"
                and r.us - temporal.ATTR_WINDOW_US <= o.us <= r.us - 1
            )
            assert got[r.event_id] == n, (user, r.event_id, n, got[r.event_id])
            n_checked += 1
    assert n_checked > 10

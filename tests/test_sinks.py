"""Exactly-once foreachBatch sink: replayed batches don't duplicate."""

from __future__ import annotations

from samza_hello_samza_spark.session import load_table
from samza_hello_samza_spark.streaming import sinks
from samza_hello_samza_spark.streaming.sources import events_stream
from tests.conftest import SF_DIR


def test_sink_writes_all_rows(spark, tmp_path):
    out = str(tmp_path / "out")
    q = sinks.idempotent_parquet_sink(
        events_stream(spark, SF_DIR), out, str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    src = load_table(spark, SF_DIR, "events")
    back = spark.read.parquet(out)
    assert back.count() == src.count()


def test_replayed_batch_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "out")
    df = load_table(spark, SF_DIR, "events").limit(100)
    sinks.write_batch_idempotent(df, 0, out)
    first = spark.read.parquet(out).count()
    # crash/redelivery: the same micro-batch id arrives again
    sinks.write_batch_idempotent(df, 0, out)
    assert spark.read.parquet(out).count() == first == 100
    # a NEW batch id appends rather than overwriting others
    sinks.write_batch_idempotent(df, 1, out)
    assert spark.read.parquet(out).count() == 200


# ---------------------------------------------------------------------------
# validated sink: CHECK constraints + dead-letter quarantine (r06)
# ---------------------------------------------------------------------------


def test_validated_sink_splits_and_tags(spark, tmp_path):
    """Clean rows reach the main table, violations land quarantined
    with the SORTED list of constraint names they broke; the union is
    the input (nothing dropped, nothing duplicated)."""
    out, dlq = str(tmp_path / "out"), str(tmp_path / "dlq")
    df = spark.createDataFrame(
        [(1, 5, "open"), (2, None, "open"), (3, -1, "weird"), (4, 2, "closed")],
        "k long, qty long, status string",
    )
    cons = {
        "qty_pos": "qty > 0",
        "status_known": "status IN ('open','closed')",
    }
    sinks.write_batch_validated(df, 0, out, dlq, cons)
    clean = spark.read.parquet(out)
    assert sorted(r.k for r in clean.collect()) == [1, 4]
    assert "_violated" not in clean.columns
    bad = {r.k: list(r._violated) for r in spark.read.parquet(dlq).collect()}
    assert bad == {2: ["qty_pos"], 3: ["qty_pos", "status_known"]}


def test_validated_sink_replay_is_idempotent_both_sides(spark, tmp_path):
    out, dlq = str(tmp_path / "out"), str(tmp_path / "dlq")
    df = spark.createDataFrame(
        [(i, i % 3 - 1) for i in range(30)], "k long, qty long"
    )
    cons = {"qty_pos": "qty > 0"}
    sinks.write_batch_validated(df, 0, out, dlq, cons)
    a = (spark.read.parquet(out).count(), spark.read.parquet(dlq).count())
    sinks.write_batch_validated(df, 0, out, dlq, cons)  # crash redelivery
    b = (spark.read.parquet(out).count(), spark.read.parquet(dlq).count())
    assert a == b == (10, 20)
    sinks.write_batch_validated(df, 1, out, dlq, cons)  # a NEW batch appends
    assert spark.read.parquet(out).count() == 20
    assert spark.read.parquet(dlq).count() == 40


def test_validated_streaming_end_to_end_matches_batch_rules(spark, tmp_path):
    """The streaming sink's split over the events topic equals the
    batch filter — stream ≡ batch, the repo's streaming-twin rule."""
    out, dlq = str(tmp_path / "out"), str(tmp_path / "dlq")
    cons = {"value_nonneg": "value >= 0", "user_known": "user_id IS NOT NULL"}
    q = sinks.validated_parquet_sink(
        events_stream(spark, SF_DIR), out, dlq, str(tmp_path / "ck"), cons
    )
    q.awaitTermination(120)
    src = load_table(spark, SF_DIR, "events")
    want_clean = src.filter("value >= 0 AND user_id IS NOT NULL").count()
    got_clean = spark.read.parquet(out).count()
    assert got_clean == want_clean
    import glob
    has_dlq_files = bool(glob.glob(dlq + "/**/*.parquet", recursive=True))
    dlq_rows = spark.read.parquet(dlq).count() if has_dlq_files else 0
    assert got_clean + dlq_rows == src.count()

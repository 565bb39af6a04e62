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

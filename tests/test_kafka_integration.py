"""Kafka end-to-end integration — runs only where the pieces exist.

The reference's primary transport is Kafka (join-example.properties,
wikipedia-feed.properties). This container ships neither the
spark-sql-kafka connector jar nor a broker binary, so the full
round-trip SKIPS here and runs wherever both are present (a CI image
with `SPARK_GRAFT_KAFKA_BOOTSTRAP` pointing at a broker and the
connector on the classpath). The file-backed `TopicLog`
(tests/test_topic_log.py) exercises the identical transport CONTRACT
— keyed routing, per-partition offsets, consumer groups, streaming
reads — in-container; this test is the wire-level complement, not the
only coverage.
"""

from __future__ import annotations

import os
import uuid

import pytest

from samza_hello_samza_spark.sources.connectors import kafka_json_stream, kafka_reader

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")


def _kafka_datasource_available(spark) -> bool:
    """True iff the spark-sql-kafka connector is on the classpath."""
    try:
        # Class.forName, not attribute access: py4j returns a lazy
        # JavaPackage for missing classes instead of raising.
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_reader_builds_without_jars(spark):
    """Builder construction must not need the connector — only .load()
    does. Guarantees job code can be written/tested offline."""
    reader = kafka_reader(spark, "broker:9092", "pageview-filter-input")
    assert reader is not None


def test_kafka_load_raises_clear_error_without_jars(spark):
    """Without the connector jar, .load() must fail with the standard
    DATA_SOURCE_NOT_FOUND guidance (not a silent no-op)."""
    if _kafka_datasource_available(spark):
        pytest.skip("connector jar present; the round-trip test covers this")
    with pytest.raises(Exception, match="(?i)kafka"):
        kafka_reader(spark, "broker:9092", "t").load()


@pytest.mark.skipif(
    BOOTSTRAP is None,
    reason="no broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port (CI image)",
)
def test_kafka_round_trip_topology(spark, tmp_path):
    """topic → parse → window → sink against a real broker.

    Mirrors tests/test_topic_log.py::test_topic_stream_topology_end_to_end
    over the wire transport: produce JSON events, read with
    kafka_json_stream, run the same windowed count, assert row parity.
    """
    if not _kafka_datasource_available(spark):
        pytest.skip("broker configured but spark-sql-kafka jar missing")
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import load_table
    from tests.conftest import SF_DIR

    topic = f"sgtest-{uuid.uuid4().hex[:8]}"
    events = load_table(spark, SF_DIR, "events").limit(500)
    (
        events.select(
            F.col("user_id").cast("string").alias("key"),
            F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    schema = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    stream = kafka_json_stream(spark, BOOTSTRAP, topic, spark.createDataFrame([], schema).schema)
    counts = stream.groupBy("event_type").count()
    q = (
        counts.writeStream.format("memory")
        .queryName(f"kafka_rt_{topic[-8:]}")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.event_type: r["count"]
        for r in spark.sql(f"SELECT * FROM kafka_rt_{topic[-8:]}").collect()
    }
    want = {
        r.event_type: r.cnt
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want

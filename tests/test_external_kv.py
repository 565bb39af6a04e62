"""External KV table (CouchbaseTableExample analog) against real SQLite:
executor-side reads/writes, streaming sendTo, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from samza_hello_samza_spark.session import load_table
from samza_hello_samza_spark.sources.external_kv import SqliteKVTable
from tests.conftest import SF_DIR


def test_point_ops(tmp_path):
    kv = SqliteKVTable(str(tmp_path / "kv.db"))
    kv.put("a", "1")
    kv.put("a", "2")  # upsert
    kv.put("b", "x")
    assert kv.get("a") == "2" and kv.get("b") == "x" and kv.get("zz") is None
    kv.delete("b")
    assert kv.get("b") is None and kv.count() == 1


def test_executor_write_then_enrich(spark, tmp_path):
    """write_batch from executors, then stream enrichment reads back."""
    kv = SqliteKVTable(str(tmp_path / "kv.db"))
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").cast("string").alias("k"), F.col("c_name").alias("v")
    )
    kv.write_batch(cust, "k", "v")
    assert kv.count() == cust.count()

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id").limit(500)
    enriched = kv.enrich_stream(ev, "user_id", "c_name", cache_name="t-ext1")
    rows = enriched.collect()
    assert len(rows) == 500
    names = {
        r.k: r.v for r in cust.collect()
    }
    for r in rows:
        assert r.c_name == names.get(str(r.user_id))


def test_write_batch_idempotent_replay(spark, tmp_path):
    kv = SqliteKVTable(str(tmp_path / "kv.db"))
    df = load_table(spark, SF_DIR, "nation").select(
        F.col("n_nationkey").cast("string").alias("k"), F.col("n_name").alias("v")
    )
    kv.write_batch(df, "k", "v")
    n1 = kv.count()
    kv.write_batch(df, "k", "v")  # replay must converge, not duplicate
    assert kv.count() == n1 == df.count()


def test_streaming_send_to_external(spark, tmp_path):
    """rate-limited micro-batch stream lands in the external store."""
    kv = SqliteKVTable(str(tmp_path / "kv.db"))
    src_dir = tmp_path / "src"
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").cast("string").alias("k"), F.col("c_mktsegment").alias("v")
    )
    cust.write.mode("overwrite").parquet(str(src_dir))
    stream = spark.readStream.schema("k STRING, v STRING").parquet(str(src_dir))
    q = kv.write_stream(stream, "k", "v", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert kv.count() == cust.count()
    one = cust.limit(1).collect()[0]
    assert kv.get(one.k) == one.v

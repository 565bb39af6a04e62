"""File-backed topic transport: Kafka-contract tests + an end-to-end
topic→parse→window→sink topology (the reference's primary transport
shape, runnable in-container)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from samza_hello_samza_spark.session import load_table
from samza_hello_samza_spark.sources.topic_log import TopicLog
from tests.conftest import SF_DIR


def _events(spark, lo, hi):
    ev = load_table(spark, SF_DIR, "events").filter(
        (F.col("event_id") >= lo) & (F.col("event_id") < hi)
    )
    return ev.select(
        F.col("user_id").alias("k"),
        F.to_json(F.struct("event_id", "user_id", "event_type", "value", "ts")).alias("v"),
    )


def test_offsets_monotonic_and_partition_stable(spark, tmp_path):
    topic = TopicLog(spark, str(tmp_path / "t1"), n_partitions=4)
    topic.produce(_events(spark, 0, 500), "k", "v")
    end1 = topic.end_offsets()
    topic.produce(_events(spark, 500, 1000), "k", "v")
    end2 = topic.end_offsets()
    assert sum(end2.values()) == 1000
    assert all(end2[p] >= end1[p] for p in end1)

    rows = topic.read_all().collect()
    # offsets are dense per partition: 0..end-1, no gaps or dups
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r.partition, []).append(r.offset)
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs)))
    # keyed routing is stable: every key lives in exactly one partition
    key_parts: dict[str, set[int]] = {}
    for r in rows:
        key_parts.setdefault(r.key, set()).add(r.partition)
    assert all(len(ps) == 1 for ps in key_parts.values())


def test_consumer_group_at_least_once(spark, tmp_path):
    topic = TopicLog(spark, str(tmp_path / "t2"), n_partitions=2)
    topic.produce(_events(spark, 0, 300), "k", "v")

    first = topic.read_batch("g1").count()
    again = topic.read_batch("g1").count()
    assert first == again == 300  # un-committed read replays

    topic.commit("g1", topic.end_offsets())
    assert topic.read_batch("g1").count() == 0

    topic.produce(_events(spark, 300, 450), "k", "v")
    assert topic.read_batch("g1").count() == 150  # only the new batch
    # an independent group still sees everything
    assert topic.read_batch("other").count() == 450


def test_topic_stream_topology_end_to_end(spark, tmp_path):
    """produce → readStream → parse(JSON serde) → windowed agg → sink,
    then produce more and verify the stream picks up the new batch."""
    topic = TopicLog(spark, str(tmp_path / "t3"), n_partitions=4)
    topic.produce(_events(spark, 0, 800), "k", "v")

    payload = StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP"
    )
    parsed = (
        topic.read_stream()
        .select(F.from_json("value", payload).alias("r"))
        .select("r.*")
    )
    counts = (
        parsed.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("topic_topology")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("select sum(n) as total from topic_topology").collect()[0].total
        assert got1 == 800

        topic.produce(_events(spark, 800, 1000), "k", "v")
        q.processAllAvailable()
        got2 = spark.sql("select sum(n) as total from topic_topology").collect()[0].total
        assert got2 == 1000

        # stream result ≡ batch recompute over the same topic data
        batch = (
            topic.read_all()
            .select(F.from_json("value", payload).alias("r"))
            .select("r.*")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        stream_rows = sorted(
            (r.window.start, r.event_type, r.n)
            for r in spark.sql("select * from topic_topology").collect()
        )
        batch_rows = sorted((r.window.start, r.event_type, r.n) for r in batch.collect())
        assert stream_rows == batch_rows
    finally:
        q.stop()


def test_json_value_round_trips_through_topic(spark, tmp_path):
    topic = TopicLog(spark, str(tmp_path / "t4"), n_partitions=2)
    topic.produce(_events(spark, 0, 100), "k", "v")
    rows = topic.read_all().collect()
    for r in rows[:20]:
        rec = json.loads(r.value)
        assert str(rec["user_id"]) == r.key


def test_compaction_keeps_latest_per_key_with_offsets(spark, tmp_path):
    """Log compaction: only the highest-offset record per key survives,
    its coordinates are unchanged, high-water marks and committed group
    offsets stay valid, and the segment file count shrinks."""
    topic = TopicLog(spark, str(tmp_path / "tc"), n_partitions=4)
    # 3 produce rounds over the SAME key range → every key has 3 versions
    for rnd in range(3):
        batch = _events(spark, 0, 200).withColumn(
            "v", F.concat(F.lit(f"round{rnd}:"), F.col("v"))
        )
        topic.produce(batch, "k", "v")
    end_before = topic.end_offsets()
    latest = {
        r.key: (r.partition, r.offset, r.value)
        for r in sorted(topic.read_all().collect(), key=lambda r: r.offset)
    }

    stats = topic.compact()
    assert stats["records_after"] < stats["records_before"]
    assert stats["files_after"] < stats["files_before"]

    rows = topic.read_all().collect()
    assert len(rows) == len(latest)
    for r in rows:
        part, off, val = latest[r.key]
        assert (r.partition, r.offset, r.value) == (part, off, val)
        assert r.value.startswith("round2:")
    # high-water marks unchanged: new produces continue from the same offsets
    assert topic.end_offsets() == end_before
    # a consumer committed at the old end sees nothing new
    topic.commit("g1", end_before)
    assert topic.read_batch("g1").count() == 0


def test_maybe_compact_threshold(spark, tmp_path):
    topic = TopicLog(spark, str(tmp_path / "tm"), n_partitions=2)
    topic.produce(_events(spark, 0, 100), "k", "v")
    assert topic.maybe_compact(min_batches=3) is None  # below threshold
    topic.produce(_events(spark, 0, 100), "k", "v")
    topic.produce(_events(spark, 0, 100), "k", "v")
    stats = topic.maybe_compact(min_batches=3)
    assert stats is not None and stats["records_after"] < stats["records_before"]
    # compaction resets the dirty-segment count → immediate re-run skips
    assert topic.maybe_compact(min_batches=3) is None


def test_compaction_drops_tombstones(spark, tmp_path):
    """A null-value record deletes its key (Kafka delete semantics)."""
    topic = TopicLog(spark, str(tmp_path / "tt"), n_partitions=2)
    topic.produce(_events(spark, 0, 50), "k", "v")
    live = topic.read_all().select("key").distinct().collect()
    victim = sorted(r.key for r in live)[0]
    tomb = spark.createDataFrame([(victim, None)], "k string, v string")
    topic.produce(tomb, "k", "v")
    topic.compact()
    keys = {r.key for r in topic.read_all().collect()}
    assert victim not in keys
    assert len(keys) == len(live) - 1


# -- property-based compaction invariants (hypothesis) -----------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _batches_st = st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),          # key
                st.one_of(st.none(), st.text(max_size=8)),      # value / tombstone
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    )

    @given(batches=_batches_st)
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_compaction_equals_model(spark, tmp_path_factory, batches):
        """For ARBITRARY keyed batches (overlapping keys, tombstones):
        compact() must leave exactly the model's latest-non-null record
        per key, with original (partition, offset) coordinates."""
        import tempfile

        root = tempfile.mkdtemp(prefix="hyptopic", dir=str(tmp_path_factory.getbasetemp()))
        topic = TopicLog(spark, root, n_partitions=3)
        for batch in batches:
            df = spark.createDataFrame(
                [(str(k), v) for k, v in batch], "k string, v string"
            )
            topic.produce(df, "k", "v")

        # model: last write per key wins, in produced offset order
        pre = sorted(topic.read_all().collect(), key=lambda r: (r.partition, r.offset))
        latest = {}
        for r in pre:
            latest[r.key] = r
        want = {
            k: (r.partition, r.offset, r.value)
            for k, r in latest.items()
            if r.value is not None
        }
        end_before = topic.end_offsets()

        topic.compact()
        got = {
            r.key: (r.partition, r.offset, r.value) for r in topic.read_all().collect()
        }
        assert got == want
        assert topic.end_offsets() == end_before


def test_sorted_compaction_semantics_and_lookup(spark, tmp_path):
    """compact_sorted keeps exactly the latest non-tombstone per key
    (same contract as compact), files are key-sorted within topic
    partition, and lookup() returns the latest values pre- AND
    post-compaction."""
    from pyspark.sql import functions as F

    log = TopicLog(spark, str(tmp_path / "t"), n_partitions=2)
    df1 = spark.createDataFrame(
        [(f"k{i}", f"v{i}.a") for i in range(50)], "k string, v string"
    )
    df2 = spark.createDataFrame(
        [(f"k{i}", f"v{i}.b") for i in range(0, 50, 2)]
        + [("k1", None)],  # tombstone
        "k string, v string",
    )
    log.produce(df1, "k", "v")
    log.produce(df2, "k", "v")

    expected = {f"k{i}": (f"v{i}.b" if i % 2 == 0 else f"v{i}.a") for i in range(50)}
    del expected["k1"]

    # lookup on the UNcompacted log already resolves latest-wins
    got_pre = {r.key: r.value for r in log.lookup(["k0", "k1", "k3"]).collect()}
    assert got_pre == {"k0": "v0.b", "k3": "v3.a"}

    stats = log.compact_sorted(parquet_block_bytes=1 << 20)
    assert stats["records_after"] == len(expected)
    got = {r.key: r.value for r in log.read_all().collect()}
    assert got == expected

    # runs are key-sorted within each topic partition file
    import pyarrow.parquet as pq

    for d, _, files in __import__("os").walk(log._data_dir):
        for f in files:
            if f.endswith(".parquet"):
                t = pq.read_table(
                    __import__("os").path.join(d, f), columns=["partition", "key"]
                )
                runs: dict[int, list[str]] = {}
                for p, k in zip(
                    t.column("partition").to_pylist(), t.column("key").to_pylist()
                ):
                    runs.setdefault(p, []).append(k)
                for p, ks in runs.items():  # sorted per topic-partition run
                    assert ks == sorted(ks), (f, p)
    # lookup after compaction
    got_post = {r.key: r.value for r in log.lookup(["k0", "k1", "k3"]).collect()}
    assert got_post == {"k0": "v0.b", "k3": "v3.a"}


def test_sorted_run_lookup_prunes_row_groups(spark, tmp_path):
    """Over a sorted run with bounded row groups, a point-key scan must
    emit far fewer rows than the run (row-group min/max pruning)."""
    from pyspark.sql import functions as F

    log = TopicLog(spark, str(tmp_path / "t"), n_partitions=1)
    n = 40_000
    df = spark.range(n).select(
        F.format_string("k%07d", F.col("id")).alias("k"),
        F.col("id").cast("string").alias("v"),
    )
    log.produce(df, "k", "v")
    log.compact(sort_runs=True, parquet_block_bytes=64 * 1024)

    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        probe = log.read_all().filter(F.col("key") == "k0020000")
        assert probe.count() == 1
        probe.collect()
        leaf = probe._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        rows_read = leaf.metrics().get("numOutputRows").get().value()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert rows_read < n / 4, f"scan emitted {rows_read} of {n} rows — no pruning"


def test_consumer_lag_tracks_commits(spark, tmp_path):
    """consumer_lag = end − committed per partition: full depth for a
    never-committed group, shrinks to zero as the group commits, and
    grows again when producers outrun the consumer."""
    topic = TopicLog(spark, str(tmp_path / "tlag"), n_partitions=2)
    topic.produce(_events(spark, 0, 100), "k", "v")
    end = topic.end_offsets()

    lag0 = topic.consumer_lag("g")
    assert lag0 == {p: end[p] for p in end}
    assert sum(lag0.values()) == 100

    # consume + commit everything → zero lag
    topic.read_batch("g")
    topic.commit("g", topic.end_offsets())
    assert sum(topic.consumer_lag("g").values()) == 0

    # producer runs ahead → lag reappears, exactly the new records
    topic.produce(_events(spark, 100, 130), "k", "v")
    assert sum(topic.consumer_lag("g").values()) == 30
    # an unrelated group still sees full depth
    assert sum(topic.consumer_lag("fresh").values()) == 130

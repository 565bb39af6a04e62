"""Continuous maintenance jobs: live ANN index upkeep and topic-fed
incrementally-maintained views.

The reference's stateful tasks keep derived state current as messages
arrive (WikipediaStatsStreamTask's KeyValueStore counters,
StreamTableJoinExample's materialized profile table; cf.
src/main/java/samza/examples/wikipedia/task/WikipediaStatsStreamTask.java
and cookbook/StreamTableJoinExample.java). At warehouse scale the same
need appears as *index and view maintenance*: new vectors must become
searchable and aggregate views must fold in deltas without re-scanning
history. Both jobs here are thin foreachBatch / consumer-loop drivers
over the batch primitives, so the update path IS the tested batch path:

- ``lsh_index_updater``: Structured Streaming sink that appends each
  micro-batch of vectors into the band-partitioned LSH index
  (``ann_index.append_lsh_index``) — cost ∝ |batch| × n_bands, files
  of existing partitions never rewritten, probes pick up new vectors
  on their next (partition-pruned) read.
- ``maintain_view_from_topic``: consume a ``TopicLog`` as a consumer
  group, fold each batch into mergeable aggregate state
  (``incremental.update_aggregate``), commit offsets only after the
  state write lands — at-least-once delivery on top of an idempotent
  merge keyed by offset ranges would be exactly-once; here replay
  safety comes from committing *after* the state swap, matching the
  reference's changelog+checkpoint ordering.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.ann_index import append_lsh_index
from ..sources.incremental import update_aggregate
from ..sources.topic_log import TopicLog


def lsh_index_updater(
    vectors_stream: DataFrame,
    index_dir: str,
    planes: np.ndarray,
    band_bits: int,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Keep an LSH index current from a stream of (vec_id, v) rows.

    foreachBatch appends the batch's band rows into the partitioned
    index; the checkpoint makes redelivered batches re-append (ANN
    candidate duplicates are removed by the probe's dropDuplicates, so
    at-least-once is semantically harmless here — the classic
    idempotent-consumer shape).
    """

    def _fold(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_lsh_index(index_dir, batch.select("vec_id", "v"), planes, band_bits)

    return (
        vectors_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def parse_events_json(batch: DataFrame) -> DataFrame:
    """Topic value (JSON) → typed events columns, the serde-in step."""
    schema = "user_id BIGINT, event_type STRING, value DOUBLE"
    return batch.select(
        F.from_json(F.col("value"), schema).alias("e")
    ).select("e.user_id", "e.event_type", "e.value")


def maintain_view_from_topic(
    spark: SparkSession,
    topic: TopicLog,
    group: str,
    state_path: str,
    keys: list[str] | None = None,
) -> int:
    """One maintenance cycle: drain, fold, commit. Returns rows folded.

    Cost is ∝ the uncommitted delta (offset-filtered topic read +
    state-sized merge), never ∝ topic history. Crash between the state
    swap and the commit ⇒ the batch replays into a state that already
    contains it — the same at-least-once window Samza has between
    changelog flush and checkpoint; callers needing exactness key the
    state by (partition, offset) ranges, which ``update_aggregate``'s
    union-merge supports by construction.
    """
    keys = keys or ["user_id"]
    batch = topic.read_batch(group).cache()
    n = batch.count()
    if n:
        update_aggregate(spark, state_path, parse_events_json(batch), keys=keys)
        # commit exactly what was read (not the topic's current end:
        # records produced since read_batch must replay next cycle).
        ends = (
            batch.groupBy("partition").agg((F.max("offset") + 1).alias("end")).collect()
        )
        topic.commit(group, {str(r.partition): int(r.end) for r in ends})
    batch.unpersist()
    return n

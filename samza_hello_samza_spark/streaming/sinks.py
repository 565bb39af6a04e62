"""Exactly-once file sink: idempotent foreachBatch writes.

Samza's delivery contract is at-least-once (duplicate processing after
a container restart is expected; see the reference's stateful tasks,
e.g. WikipediaStatsStreamTask's counters, which tolerate replays).
Structured Streaming can upgrade that to effective exactly-once for
file outputs: the checkpoint names each micro-batch with a stable
``batch_id``, so a sink that writes *by batch id* with dynamic
partition overwrite makes replays land on top of their own previous
output instead of appending duplicates.

At 100 TB this matters twice over: restarts are routine at that
scale, and dedup-after-the-fact over petabyte outputs is exactly the
job you never want to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

BATCH_COL = "batch_id"


def write_batch_idempotent(df: DataFrame, batch_id: int, path: str) -> None:
    """Write one micro-batch under ``batch_id=N``; replay-safe.

    Dynamic partition overwrite replaces only this batch's partition —
    concurrent/earlier batches' output is untouched, and re-running
    the same batch (post-crash re-delivery) is a no-op state-wise.
    """
    (
        df.withColumn(BATCH_COL, F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL)
        .parquet(path)
    )


def idempotent_parquet_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a stream writing exactly-once parquet batches to ``path``."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: write_batch_idempotent(df, bid, path)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

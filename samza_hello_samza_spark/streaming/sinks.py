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


# ---------------------------------------------------------------------------
# validated sink: CHECK constraints + dead-letter quarantine (r06)
# ---------------------------------------------------------------------------
#
# The streaming twin of sources/merge's CHECK constraints. A batch job
# can REJECT a bad write and make the producer fix it; a streaming
# pipeline cannot — failing the query on one bad record stalls the
# whole topic behind it (the classic poison-pill outage). The standard
# answer is a dead-letter route: rows that fail validation land in a
# QUARANTINE table tagged with the constraint they broke, clean rows
# flow on, and both writes stay batch-id idempotent so replays after a
# crash land on top of themselves.


def write_batch_validated(
    df: DataFrame,
    batch_id: int,
    path: str,
    quarantine_path: str,
    constraints: dict[str, str],
) -> None:
    """Split one micro-batch into clean/quarantined by CHECK
    constraints and write each side idempotently.

    Semantics match ``merge._check_constraints``: a row is clean iff
    EVERY expression evaluates to TRUE (NULL = violation). Quarantined
    rows carry ``_violated`` — a sorted array of the constraint names
    they broke — so the operator can replay them after a fix without
    re-deriving the reason. The split is ONE pass (a boolean column
    per constraint, computed once and reused by both filters inside
    the same localCheckpoint), and each side is a dynamic-overwrite
    by-batch-id write: replaying a batch lands both sides on top of
    their previous output, so at-least-once delivery upgrades to
    effective exactly-once INCLUDING the dead letters.
    """
    checks = {
        name: F.coalesce(F.expr(expr), F.lit(False))
        for name, expr in sorted(constraints.items())
    }
    staged = df.withColumn(
        "_violated",
        F.array_sort(
            F.filter(
                F.array(
                    *[
                        F.when(~c, F.lit(name)).otherwise(F.lit(None))
                        for name, c in checks.items()
                    ]
                ),
                lambda x: x.isNotNull(),
            )
        ),
    ).localCheckpoint()  # evaluate the checks once for both routes
    write_batch_idempotent(
        staged.filter(F.size("_violated") == 0).drop("_violated"), batch_id, path
    )
    write_batch_idempotent(
        staged.filter(F.size("_violated") > 0), batch_id, quarantine_path
    )


def validated_parquet_sink(
    stream: DataFrame,
    path: str,
    quarantine_path: str,
    checkpoint: str,
    constraints: dict[str, str],
    available_now: bool = True,
) -> StreamingQuery:
    """Start a stream writing constraint-validated exactly-once parquet
    batches: clean rows to ``path``, violations (tagged ``_violated``)
    to ``quarantine_path``."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: write_batch_validated(
                df, bid, path, quarantine_path, constraints
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

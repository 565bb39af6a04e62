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
from ..sources.incremental import update_aggregate, update_aggregate_signed
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


def ivf_index_updater(
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Keep a committed IVF layout current from a stream of
    (vec_id, v [, attrs...]) rows — the live-ingest twin of
    ``ann_index.append_ivf_index`` + snapshot commit.

    Each micro-batch quantizes against the frozen centroids, lands as
    appended files, and ONE ``commit_index_snapshot`` makes it
    visible — probes pinned to earlier manifests are untouched
    (torn-append-proof, unlike the LSH updater whose at-least-once
    duplicates are probe-deduped: a corpus layout must not hold
    duplicate vec_id rows, so this job is EXACTLY-once). Replay
    safety is the ``mv_refresh_job`` marker discipline: an
    applied-batch marker written after the commit makes redelivery a
    no-op; the marker-not-yet-written crash window re-appends a batch
    whose files were never committed, and the listing-based commit
    then publishes both copies — the single-maintainer contract says
    run one updater per index, and the recovery for that window is
    ``upsert_ivf_vectors`` (idempotent by id) from the staged batch.

    On a signature-bearing layout (``build_ivf_index(sigs=True)``)
    the append derives the packed sign-bit words for every arriving
    vector (derived-column recompute in ``append_ivf_index``), so the
    binary Hamming probe serves streamed vectors with no extra step —
    the streaming signature upkeep of the materialized binary-ANN
    path.
    """
    import os

    from ..operators.ann_index import append_ivf_index, commit_index_snapshot

    corpus_dir = os.path.join(index_dir, "corpus")
    marker_dir = os.path.join(checkpoint_dir, "_applied")
    os.makedirs(marker_dir, exist_ok=True)

    def _fold(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker) or batch.isEmpty():
            return
        append_ivf_index(batch.sparkSession, index_dir, batch)
        commit_index_snapshot(corpus_dir)
        with open(marker, "w") as fh:
            fh.write("applied")

    return (
        vectors_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def mv_refresh_job(
    events_stream: DataFrame, mv_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Keep the continuous-aggregate MV (``plans/matview``) current
    from a live events stream — the streaming twin of ``refresh_mv``.

    Each micro-batch is folded into the MV at delta cost (grain
    aggregate + partition-pruned merge + dynamic overwrite of touched
    days). ``refresh_mv`` is a MERGE, not an overwrite, so replayed
    batches must not fold twice: an applied-batch marker file
    (written after the merge lands) makes redelivery a no-op — the
    idempotent-consumer shape. The marker is per (checkpoint, batch
    id), so a restarted query resumes exactly where the Spark
    checkpoint says. The remaining crash window (merge finished,
    marker not yet written) is the same one every non-transactional
    sink has; the manifest-swap upgrade that closes it completely is
    ``TxnView`` — use that when folding multiple sources atomically.
    """
    import os

    marker_dir = os.path.join(checkpoint_dir, "_applied")
    os.makedirs(marker_dir, exist_ok=True)

    def _fold(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker) or batch.isEmpty():
            return
        from ..plans.matview import build_mv, refresh_mv

        if os.path.exists(os.path.join(mv_dir, "_SUCCESS")):
            refresh_mv(batch.sparkSession, mv_dir, batch)
        else:
            build_mv(batch.sparkSession, batch, mv_dir)
        with open(marker, "w") as fh:
            fh.write("applied")

    return (
        events_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def cdc_apply_job(
    topic, table, checkpoint_dir: str, max_files_per_trigger: int | None = 1
) -> StreamingQuery:
    """Continuously apply a keyed changelog topic to a ``MergeTable``.

    The Debezium/Kafka-Connect sink pattern over this repo's own
    primitives: the ``TopicLog`` carries upserts (value = new row) and
    deletes (value NULL — Kafka tombstones); each micro-batch is
    compacted to its latest record per key (same argmax as
    ``topic_log.compact``) and MERGEd into the bucketed table —
    partition-pruned read, touched-bucket-only rewrite.

    Exactly-once WITHOUT marker files: applying a CDC batch is
    idempotent by construction — upserts set absolute values and
    tombstones never re-insert (``MergeTable.merge``'s
    not-matched-and-delete skip clause) — so at-least-once redelivery
    converges to the same table.
    """
    from pyspark.sql import Window

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        w = Window.partitionBy("key").orderBy(F.desc("offset"))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col("key").alias(table.key_col),
                F.col("value").alias("v"),
                F.col("value").isNull().cast("int").alias("_tombstone"),
            )
        )
        table.merge(latest, delete_cond=F.col("s._tombstone") == 1)

    return (
        topic.read_stream(max_files_per_trigger=max_files_per_trigger)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def versioned_merge_sink(
    stream: DataFrame,
    table,
    checkpoint_dir: str,
    app_id: str,
    delete_col: str | None = None,
) -> StreamingQuery:
    """Exactly-once streaming MERGE into a ``VersionedMergeTable`` —
    the Delta ``foreachBatch`` + ``txnAppId``/``txnVersion`` upsert
    sink on this layout's terms.

    Each micro-batch MERGEs with ``txn=(app_id, batch_id)``: the
    table records the app's highest applied batch id IN the same
    atomic manifest swap as the data, so a redelivered batch (crash
    between commit and checkpoint, rewound checkpoint, duplicate
    trigger) is refused by the TABLE itself — no marker files, no
    crash window between "data landed" and "marker written". This is
    strictly stronger than ``cdc_apply_job``'s
    idempotent-by-construction convergence: arbitrary (even
    non-idempotent) merge sources fold exactly once.

    ``delete_col``: optional int column in the stream; rows with 1
    delete their key (and never insert — the MERGE's tombstone
    clause).
    """

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        cond = (
            F.col(f"s.{delete_col}") == 1 if delete_col is not None else None
        )
        table.merge(batch, delete_cond=cond, txn=(app_id, int(batch_id)))

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def windowed_topk_job(
    events: DataFrame,
    table,
    checkpoint_dir: str,
    watermark: str | None = "10 minutes",
) -> StreamingQuery:
    """Maintain per-window user leaderboards from a live event stream.

    Streaming windowed counts (update mode — each micro-batch emits
    the keys whose totals changed) are UPSERTED into a ``MergeTable``
    keyed by (window, user): update-mode totals are absolute, so the
    merge replaces rather than sums, making redelivery idempotent for
    free (same argument as ``cdc_apply_job``). The leaderboard itself
    is a read-side concern — ``windowed_topk_snapshot`` ranks within
    each window (bounded partitions) over the maintained state, so
    the expensive path (the streamed count) stays a plain windowed
    aggregate with watermarked state eviction.
    """
    # watermark=None keeps all window state (exact parity with batch —
    # what the pytest asserts); the production default evicts state 10
    # minutes behind event time, accepting that later-than-watermark
    # arrivals are dropped — the standard completeness/state trade.
    watermarked = events.withWatermark("ts", watermark) if watermark else events
    counts = (
        watermarked
        .groupBy(F.window("ts", "5 minutes"), "user_id")
        .count()
        .select(
            F.concat(
                F.unix_timestamp("window.start").cast("string"),
                F.lit(":"),
                F.col("user_id").cast("string"),
            ).alias("k"),
            F.unix_timestamp("window.start").alias("window_start"),
            "user_id",
            F.col("count").alias("cnt"),
        )
    )

    def _fold(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        table.merge(batch)

    return (
        counts.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def windowed_topk_snapshot(spark: SparkSession, table, k: int = 3) -> DataFrame:
    """Current top-k users per window from the maintained state."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("cnt"), F.asc("user_id")
    )
    return (
        table.read()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("window_start", F.col("rn").alias("rank"), "user_id", "cnt")
    )


def parse_events_json(batch: DataFrame) -> DataFrame:
    """Topic value (JSON) → typed events columns, the serde-in step."""
    schema = "user_id BIGINT, event_type STRING, value DOUBLE"
    return batch.select(
        F.from_json(F.col("value"), schema).alias("e")
    ).select("e.user_id", "e.event_type", "e.value")


def _write_results_idempotent(
    per_query: list[DataFrame], out_dir: str, batch_id: int
) -> None:
    """Exactly-once result sink for the serving trilogy.

    foreachBatch is at-least-once: a crash-and-replay re-runs the
    micro-batch, and a bare ``mode('append')`` would duplicate every
    (query_id, vec_id) row. Writing the batch's unioned results into
    a ``_batch_id={N}`` partition with DYNAMIC partition overwrite
    makes the replay overwrite its own partition and nothing else —
    the same idempotence-by-partition discipline as ``mv_refresh_job``
    — and collapses the per-query appends into ONE job per batch.
    """
    import functools

    results = functools.reduce(DataFrame.unionByName, per_query)
    (
        results.withColumn("_batch_id", F.lit(int(batch_id)))
        .coalesce(1)  # micro-batch-sized top-k rows; one file per batch
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(out_dir)
    )


def ann_serving_job(
    query_stream: DataFrame,
    index_dir: str,
    planes: np.ndarray,
    band_bits: int,
    out_dir: str,
    checkpoint_dir: str,
    top_k: int = 10,
    n_flips: int = 0,
) -> StreamingQuery:
    """Serve ANN queries from a stream against the committed index snapshot.

    The query side of the live-index story: ``lsh_index_updater``
    appends vectors, ``commit_index_snapshot`` publishes them, and this
    job answers a stream of (query_id, v) rows — each micro-batch
    resolves the CURRENT committed snapshot (manifest read per batch:
    queries never see a torn append), probes the pruned (band, code)
    partitions per query, exact-cosine re-ranks, and writes
    (query_id, vec_id, cosine) results to a parquet sink, exactly
    once under replay (``_write_results_idempotent``). Per-batch
    driver work is one manifest read + per-query band-code hashes —
    query vectors are micro-batch-sized by definition.

    ``n_flips`` > 0 serves MULTI-PROBE (r10, VERDICT r09 #2): each
    band probes its own bucket plus the n_flips lowest-|margin|
    bit-flip buckets in the pinned ``multiprobe_band_codes`` order —
    the recall dial the batch path measured (0.30 → 0.70 recall@10 at
    sf0.1 for 2.5× candidates) extended to the tombstone-aware
    snapshot read, so the streaming tier buys recall with probe
    partitions of the SAME committed table, never extra tables.
    """
    from ..operators.ann_index import (
        probe_lsh_snapshot,
        probe_lsh_snapshot_multi,
    )

    def _serve(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        queries = batch.select("query_id", "v").collect()  # micro-batch-sized
        per_query = []
        for q in queries:
            qvec = np.asarray(q.v)
            qnorm = float(np.linalg.norm(qvec))
            cand = (
                probe_lsh_snapshot_multi(
                    spark, index_dir, qvec, planes, band_bits, n_flips
                )
                if n_flips > 0
                else probe_lsh_snapshot(spark, index_dir, qvec, planes, band_bits)
            )
            qv = F.array(*[F.lit(float(x)) for x in qvec])
            dot = F.aggregate(
                F.zip_with(F.col("v"), qv, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            norm = F.sqrt(
                F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
            )
            per_query.append(
                cand.withColumn("cosine", F.round(dot / (norm * F.lit(qnorm)), 6))
                .orderBy(F.desc("cosine"), F.asc("vec_id"))
                .limit(top_k)
                .select(
                    F.lit(int(q.query_id)).alias("query_id"),
                    "vec_id",
                    "cosine",
                )
            )
        _write_results_idempotent(per_query, out_dir, batch_id)

    return (
        query_stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def hybrid_serving_job(
    query_stream: DataFrame,
    bm25_index_dir: str,
    sq8_index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    attr_eq: tuple[str, object] | None = None,
) -> StreamingQuery:
    """Serve HYBRID (lexical + vector) queries from a stream against
    the CURRENT committed layouts — the streaming twin of
    ``similarity.hybrid_search_indexed`` (r11, VERDICT r10 #3) and the
    enrich-at-query-time contract of the reference's
    StreamTableJoinExample (cookbook/StreamTableJoinExample.java):
    each streamed (query_id, terms, v) row is answered by joining it
    against committed index state, never by scanning the corpus.

    Per micro-batch: resolve the SQ8 corpus manifest ONCE (every
    query in the batch reads one committed snapshot — a mid-batch
    commit is invisible until the next batch, the trilogy's
    snapshot-isolation discipline), then serve each query through
    ``similarity.hybrid_topk_from_layouts`` — the SAME function the
    batch keys call, so batch-parity is structural: the WAND
    tier-pruned BM25 leg (layout_version-keyed pricing cache makes
    repeat vocabularies cheap across batches AND restarts), the SQ8
    ADC shortlist + exact snapshot rerank, rank-only RRF. Results
    land exactly-once under replay (``_write_results_idempotent``).
    ``attr_eq`` serves the FILTERED hybrid (label predicate pre-cut
    on both legs) when the layouts are attribute-bearing.

    Scale: per-query cost is index-sized on both legs (tier-pruned
    posting blocks, DIM-byte code words, M rerank vectors); driver
    state is the micro-batch's query rows plus bounded WAND pricing.
    """
    from ..operators.ann_index import read_index_manifest
    from ..operators.similarity import hybrid_topk_from_layouts

    def _serve(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        queries = batch.select("query_id", "terms", "v").collect()
        # one manifest read per batch: snapshot isolation for the
        # whole micro-batch (same contract as ivf/pq serving)
        man = read_index_manifest(f"{sq8_index_dir}/corpus")
        per_query = []
        for q in queries:
            fused = hybrid_topk_from_layouts(
                spark,
                bm25_index_dir,
                sq8_index_dir,
                [str(t) for t in q.terms],
                np.asarray(q.v, dtype=float),
                attr_eq=attr_eq,
                man=man,
            )
            per_query.append(
                fused.select(
                    F.lit(int(q.query_id)).alias("query_id"), "*"
                )
            )
        _write_results_idempotent(per_query, out_dir, batch_id)

    return (
        query_stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def ivf_serving_job(
    query_stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    top_k: int = 10,
    nprobe: int = 4,
) -> StreamingQuery:
    """Serve ANN queries from a stream via the IVF route — the third
    member of the serving trilogy (LSH bands, PQ/ADC codes, IVF
    lists). Per micro-batch, each query resolves the CURRENT
    committed corpus snapshot, scans only its ``nprobe`` nearest
    lists (partition pruning inside the manifest's file set —
    ``ann_index.probe_ivf_snapshot``), exact-cosine re-ranks them,
    and writes (query_id, vec_id, cosine) results exactly once under
    replay (``_write_results_idempotent``).
    """
    from ..operators.ann_index import probe_ivf_snapshot

    def _serve(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        per_query = []
        for q in batch.select("query_id", "v").collect():  # micro-batch-sized
            qvec = np.asarray(q.v)
            qnorm = float(np.linalg.norm(qvec))
            cand = probe_ivf_snapshot(spark, index_dir, qvec, nprobe)
            qv = F.array(*[F.lit(float(x)) for x in qvec])
            dot = F.aggregate(
                F.zip_with(F.col("v"), qv, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            norm = F.sqrt(
                F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
            )
            per_query.append(
                cand.withColumn("cosine", F.round(dot / (norm * F.lit(qnorm)), 6))
                .orderBy(F.desc("cosine"), F.asc("vec_id"))
                .limit(top_k)
                .select(
                    F.lit(int(q.query_id)).alias("query_id"),
                    "vec_id",
                    "cosine",
                )
            )
        _write_results_idempotent(per_query, out_dir, batch_id)

    return (
        query_stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def pq_serving_job(
    query_stream: DataFrame,
    index_dir: str,
    vectors: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    top_k: int = 10,
    n_candidates: int = 64,
) -> StreamingQuery:
    """Serve ANN queries from a stream via the PQ/ADC route.

    The memory-bound twin of ``ann_serving_job``: instead of probing
    LSH band partitions, each micro-batch ADC-ranks the committed
    codes snapshot (codes-only columns, a few bytes per corpus vector
    — ``ann_index.probe_pq_snapshot``), then exact-cosine re-ranks
    only the ``n_candidates`` finalists against the full ``vectors``
    relation via a broadcast semi-join on vec_id — the same
    candidates→re-rank shape as batch ``similarity.ann_pq_topk``.
    Snapshot isolation per batch: the manifest is resolved at probe
    time, so an in-flight ``append_pq_index`` is invisible until its
    ``commit_index_snapshot``. Per-batch driver work is one codebook
    read (m×ksub rows) + per-query lookup tables — micro-batch-sized
    by construction.
    """
    from ..operators.ann_index import probe_pq_snapshot

    def _serve(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        queries = batch.select("query_id", "v").collect()  # micro-batch-sized
        per_query = []
        for q in queries:
            qvec = np.asarray(q.v)
            qnorm = float(np.linalg.norm(qvec))
            cand_ids = probe_pq_snapshot(
                spark, index_dir, qvec, n_candidates
            ).select("vec_id")
            cand = vectors.join(F.broadcast(cand_ids), "vec_id", "left_semi")
            qv = F.array(*[F.lit(float(x)) for x in qvec])
            dot = F.aggregate(
                F.zip_with(F.col("v"), qv, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            norm = F.sqrt(
                F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
            )
            per_query.append(
                cand.withColumn("cosine", F.round(dot / (norm * F.lit(qnorm)), 6))
                .orderBy(F.desc("cosine"), F.asc("vec_id"))
                .limit(top_k)
                .select(
                    F.lit(int(q.query_id)).alias("query_id"),
                    "vec_id",
                    "cosine",
                )
            )
        _write_results_idempotent(per_query, out_dir, batch_id)

    return (
        query_stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def cms_updater(
    stream: DataFrame, state_path: str, key_col: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain a count-min sketch from a stream — mergeable-sketch state.

    CMS cells are counters, so the sketch folds exactly like the
    incremental aggregates: each micro-batch contributes its (row,
    bucket, cnt) partials (bounded at D×W rows per batch no matter the
    batch size — map-side combine does it) and the state merge is a
    union + sum. The stored sketch answers heavy-hitter / frequency
    queries over the WHOLE stream history in O(D×W) space — the
    unbounded-key-space answer the exact groupBy can't give.

    r07 hardening: the fold commits through the snapshot-manifest
    batch gate (``fold_cms_cells``) like every other maintainer in
    this module. Counter addition — unlike the k-min folds — is NOT
    replay-idempotent, so here the gate IS the exactly-once
    mechanism: the pre-r07 ``.staging``/rename fold double-counted a
    batch replayed after a crash between the state swap and the
    checkpoint commit (at-least-once window).
    """

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fold_cms_cells(batch, state_path, key_col, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def _legacy_cms_files(state_path: str) -> list[str]:
    """Pre-r07 ``cms_updater`` state: cell parquet written FLAT at
    ``state_path`` (no ``v{N}`` snapshot dirs, no manifest). The
    manifest layout would otherwise read version 0 there and silently
    restart counts from zero on an upgraded stream."""
    import glob
    import os

    return sorted(glob.glob(os.path.join(state_path, "*.parquet")))


def fold_cms_cells(
    batch: DataFrame,
    state_path: str,
    key_col: str = "user_id",
    batch_id: int | None = None,
) -> bool:
    """Add one delta's (row, bucket) counts into the committed CMS
    cell table (snapshot-manifest commit, see ``fold_kmv_sample``;
    the batch gate is mandatory here — counters double on replay).

    Legacy migration: the first fold over a pre-manifest state dir
    (flat cell parquet at the root, the pre-r07 ``cms_updater``
    layout) folds those root-level cells into v1 alongside the
    delta — an upgraded stream keeps its whole-history counts —
    and removes the migrated flat files after the manifest commit.
    The migrating fold leaves a ``_FLAT_MIGRATED`` marker NAMING the
    migrated files (r10); flat files found at version > 0 are deleted
    ONLY when the marker names them (crash orphans of a prior
    migrating fold's cleanup). Any other flat — no marker, a pre-r10
    name-less marker, or a name not in the set (e.g. a still-running
    pre-manifest writer dropped new cells AFTER the migration) — was
    never folded, so deleting it would destroy the only copy of its
    counts; we warn and leave it."""
    import json
    import os
    import shutil
    import warnings

    from ..operators.sketches import CMS_D, _cms_bucket

    os.makedirs(state_path, exist_ok=True)
    man = _dw_manifest(state_path)
    if batch_id is not None and batch_id <= man["applied_batch"]:
        return False
    spark = batch.sparkSession
    # at version 0 flat files are unmigrated legacy state (fold them);
    # at version > 0 they are EITHER orphans of a crash between a
    # prior migrating fold's manifest commit and its cleanup (the
    # _FLAT_MIGRATED marker says so — already folded, safe to remove)
    # OR never-folded legacy cells under a version advanced by
    # pre-migration fold code (no marker — removing them would be the
    # only copy of those counts; warn and leave in place).
    flat = _legacy_cms_files(state_path)
    legacy = flat if man["version"] == 0 else []
    migrated_marker = os.path.join(state_path, "_FLAT_MIGRATED")
    pairs = F.array(
        *[
            F.struct(
                F.lit(row).alias("row"),
                _cms_bucket(F.col(key_col), row).alias("bucket"),
            )
            for row in range(CMS_D)
        ]
    )
    delta = (
        batch.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if man["version"] > 0:
        delta = (
            delta.unionByName(
                spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))
            )
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
    elif legacy:
        delta = (
            delta.unionByName(
                spark.read.parquet(*legacy).select("row", "bucket", "cnt")
            )
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
    new_version = man["version"] + 1
    delta.write.mode("overwrite").parquet(
        os.path.join(state_path, f"v{new_version}")
    )
    new_man = {
        "version": new_version,
        "applied_batch": batch_id if batch_id is not None else man["applied_batch"],
    }
    tmp = os.path.join(state_path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(new_man, f)
    if legacy:
        # marker BEFORE the commit: a crash in between leaves version 0
        # + marker, and the next fold simply re-runs the migration (the
        # v1 write never landed as current); a crash AFTER the commit
        # leaves marker + folded flats, which the next fold deletes.
        # The marker records the EXACT migrated filenames (r10): it
        # proves THESE flats were folded, not that any future flat is
        # — a still-running pre-manifest writer dropping new cells
        # after the migration must never have them silently deleted.
        mtmp = migrated_marker + ".tmp"
        with open(mtmp, "w") as mf:
            json.dump(sorted(os.path.basename(p) for p in legacy), mf)
        os.replace(mtmp, migrated_marker)
    os.replace(tmp, os.path.join(state_path, "MANIFEST.json"))  # THE commit
    if flat:
        migrated_names: set[str] = set()
        if os.path.exists(migrated_marker):
            try:
                with open(migrated_marker) as mf:
                    migrated_names = set(json.load(mf))
            except ValueError:
                # pre-r10 empty marker: it proves SOME past flats were
                # folded, not WHICH — scope to nothing (conservative)
                migrated_names = set()
        leftovers = []
        for f in flat:
            if os.path.basename(f) in migrated_names:
                if os.path.exists(f):  # migrated (now or by a crashed
                    os.remove(f)  # prior fold) — safe to reclaim
            else:
                leftovers.append(f)
        if leftovers:
            warnings.warn(
                f"{state_path}: flat CMS cells present at manifest "
                f"version {new_version} that no _FLAT_MIGRATED entry "
                "names — never folded by this code; left in place "
                "(fold them manually or rebuild the stream state): "
                f"{[os.path.basename(p) for p in leftovers]}",
                stacklevel=2,
            )
    for v in range(1, new_version - 1):  # keep current + previous
        d = os.path.join(state_path, f"v{v}")
        if os.path.exists(d):
            shutil.rmtree(d)
    return True


def read_cms_cells(spark: SparkSession, state_path: str) -> DataFrame:
    """The committed D×W cell table at the manifest version. A
    pre-manifest state dir (flat legacy cells, no fold yet) reads its
    root-level cells directly, so estimates stay correct before AND
    after the first migrating fold."""
    import os

    man = _dw_manifest(state_path)
    if man["version"] == 0:
        legacy = _legacy_cms_files(state_path)
        if legacy:
            return spark.read.parquet(*legacy).select("row", "bucket", "cnt")
        return spark.createDataFrame([], "row int, bucket bigint, cnt bigint")
    return spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))


def cms_estimate(spark: SparkSession, state_path: str, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-estimate stream-lifetime frequencies from the stored sketch.

    ``keys``: a DataFrame with ``key_col``. The sketch is sketch-sized
    by construction → broadcast; estimate = min over the D cells."""
    from ..operators.sketches import CMS_D, _cms_bucket

    cells = read_cms_cells(spark, state_path)
    cand = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(row).alias("row"),
                        _cms_bucket(F.col(key_col), row).alias("bucket"),
                    )
                    for row in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.row", "p.bucket")
    return (
        cand.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )


def kmv_updater(
    stream: DataFrame, state_path: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain per-group KMV quantile samples from a stream — the
    streaming twin of ``sketches.quantile_kmv_calibration``.

    The k-minimum-values sample is mergeable by construction (k-min of
    a union = k-min over per-part k-mins — the batch pytest proves the
    rule), so it folds exactly like the CMS cells above: each
    micro-batch contributes its per-group k-min partial (bounded at
    K·groups rows however large the batch) and the state merge is
    union → k-min again. The stored sample answers quantile queries
    over the WHOLE stream history in O(K·groups) space.
    """
    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fold_kmv_sample(batch, state_path, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def fold_kmv_sample(
    batch: DataFrame, state_path: str, batch_id: int | None = None
) -> bool:
    """Merge one events delta into the per-group k-min sample state.

    Same snapshot-manifest commit as ``fold_domain_wordcounts``: the
    merged sample lands in an immutable ``v{N+1}`` directory and ONE
    atomic MANIFEST.json replace records {version, applied_batch} —
    crash before the swap leaves v{N} committed and the batch unmarked
    (clean re-fold); a redelivered batch id ≤ applied_batch no-ops.
    Returns True iff the delta was folded.
    """
    import json
    import os
    import shutil

    from ..operators.sketches import _kmv_sample

    os.makedirs(state_path, exist_ok=True)
    man = _dw_manifest(state_path)  # same {version, applied_batch} shape
    if batch_id is not None and batch_id <= man["applied_batch"]:
        return False
    spark = batch.sparkSession
    merged_in = batch.select("event_type", "event_id", "value")
    if man["version"] > 0:
        merged_in = merged_in.unionByName(
            spark.read.parquet(
                os.path.join(state_path, f"v{man['version']}")
            ).select("event_type", "event_id", "value")
        )
    sample = _kmv_sample(merged_in)
    new_version = man["version"] + 1
    sample.write.mode("overwrite").parquet(
        os.path.join(state_path, f"v{new_version}")
    )
    new_man = {
        "version": new_version,
        "applied_batch": batch_id if batch_id is not None else man["applied_batch"],
    }
    tmp = os.path.join(state_path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(new_man, f)
    os.replace(tmp, os.path.join(state_path, "MANIFEST.json"))  # THE commit
    for v in range(1, new_version - 1):  # keep current + previous
        d = os.path.join(state_path, f"v{v}")
        if os.path.exists(d):
            shutil.rmtree(d)
    return True


def read_kmv_sample(spark: SparkSession, state_path: str) -> DataFrame:
    """The committed per-group k-min sample at the manifest version."""
    import os

    man = _dw_manifest(state_path)
    if man["version"] == 0:
        return spark.createDataFrame(
            [], "event_type string, event_id bigint, value double, h bigint, rnk int"
        )
    return spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))


def kmv_quantile_snapshot(spark: SparkSession, state_path: str) -> DataFrame:
    """Estimated p50/p90 per group from the maintained KMV sample —
    identical expressions to the batch calibration key's estimate
    side, so stream-fold ≡ batch-sample is directly assertable."""
    sample = read_kmv_sample(spark, state_path)
    return sample.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.round(F.percentile("value", 0.5), 6).alias("est_p50"),
        F.round(F.percentile("value", 0.9), 6).alias("est_p90"),
    )


def audience_kmv_updater(
    stream: DataFrame, state_path: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain per-event-type AUDIENCE KMV sketches (K smallest
    distinct-user hashes) from a live events stream — the streaming
    twin of ``sketches.audience_kmv_setops``'s sketch-build stage.

    Same mergeability argument as ``kmv_updater``: the k-min of
    distinct user hashes folds per micro-batch at K·groups state
    cost, and because the fold is a pure k-min it is additionally
    IDEMPOTENT to row replays (re-folding rows already in the sketch
    changes nothing) — the manifest batch gate is still kept so a
    redelivered batch skips the write entirely. The standing sketch
    table answers the full union/intersection pair algebra
    (``audience_kmv_setops``'s usk stage) without touching the events
    history.
    """

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fold_audience_kmv(batch, state_path, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def fold_audience_kmv(
    batch: DataFrame, state_path: str, batch_id: int | None = None
) -> bool:
    """Merge one events delta into the per-type audience k-min sketch
    (snapshot-manifest commit, see ``fold_kmv_sample``)."""
    import json
    import os
    import shutil

    from pyspark.sql import Window

    from ..operators.sketches import KMV_SET_K, _user_hash

    os.makedirs(state_path, exist_ok=True)
    man = _dw_manifest(state_path)
    if batch_id is not None and batch_id <= man["applied_batch"]:
        return False
    spark = batch.sparkSession
    delta = batch.select(
        "event_type", "user_id", _user_hash(F.col("user_id")).alias("h")
    )
    if man["version"] > 0:
        delta = delta.unionByName(
            spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))
        )
    w = Window.partitionBy("event_type").orderBy("h", "user_id")
    sketch = (
        delta.distinct()  # same user re-arriving collapses pre-rank
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KMV_SET_K)
        .drop("rnk")
    )
    new_version = man["version"] + 1
    sketch.write.mode("overwrite").parquet(
        os.path.join(state_path, f"v{new_version}")
    )
    new_man = {
        "version": new_version,
        "applied_batch": batch_id if batch_id is not None else man["applied_batch"],
    }
    tmp = os.path.join(state_path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(new_man, f)
    os.replace(tmp, os.path.join(state_path, "MANIFEST.json"))  # THE commit
    for v in range(1, new_version - 1):  # keep current + previous
        d = os.path.join(state_path, f"v{v}")
        if os.path.exists(d):
            shutil.rmtree(d)
    return True


def read_audience_kmv(spark: SparkSession, state_path: str) -> DataFrame:
    """The committed per-type audience sketch at the manifest version."""
    import os

    man = _dw_manifest(state_path)
    if man["version"] == 0:
        return spark.createDataFrame(
            [], "event_type string, user_id bigint, h bigint"
        )
    return spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))


class TxnView:
    """Multi-topic transactionally-maintained view: exactly-once folds.

    The single-topic path above has an at-least-once window between the
    state swap and the offset commit; with TWO input topics the naive
    version has a worse failure mode — one topic committed, the other
    not — leaving the view *internally inconsistent* (e.g. clicks
    folded, views not). This maintainer closes both gaps with the
    classic snapshot-manifest design (the pattern behind Iceberg/Delta
    commits and Kafka's transactional consume-transform-produce):

    - state lives in immutable versioned snapshots ``state/v{N}``;
    - a single ``MANIFEST.json`` holds {version, offsets-per-topic} and
      is swapped with an atomic ``os.replace``;
    - a cycle reads every topic FROM THE MANIFEST's offsets (not group
      state), folds all deltas into version N+1, then swaps the
      manifest once.

    Crash anywhere ⇒ the manifest still points at version N with the
    old offsets for BOTH topics: the half-written ``v{N+1}`` dir is
    invisible and the next cycle re-drains exactly the same deltas —
    exactly-once across all inputs, by atomicity of the single swap.

    State is long-form mergeable partials keyed by (keys..., topic):
    union + re-aggregate per cycle, cost ∝ |delta| + |state keys| —
    history is never re-scanned.
    """

    KEEP_VERSIONS = 2  # current + previous for in-flight readers

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        topics: dict[str, TopicLog],
        keys: tuple[str, ...] = ("user_id",),
    ):
        import os

        self.spark = spark
        self.root = root
        self.topics = topics
        self.keys = list(keys)
        self._manifest_path = os.path.join(root, "MANIFEST.json")
        os.makedirs(os.path.join(root, "state"), exist_ok=True)

    # -- manifest ---------------------------------------------------------

    def manifest(self) -> dict:
        import json
        import os

        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"version": 0, "offsets": {name: {} for name in self.topics}}

    def _swap_manifest(self, man: dict) -> None:
        import json
        import os

        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path)  # THE commit point

    def _state_dir(self, version: int) -> str:
        import os

        return os.path.join(self.root, "state", f"v{version}")

    # -- maintenance cycle ------------------------------------------------

    def cycle(self) -> int:
        """Drain every topic from the manifest offsets, fold, commit once.

        Returns total records folded (0 ⇒ no state version written)."""
        import os

        man = self.manifest()
        partials = []
        new_offsets: dict[str, dict[str, int]] = {}
        total = 0
        for name, topic in self.topics.items():
            batch = topic.read_from(man["offsets"].get(name, {})).cache()
            n = batch.count()
            total += n
            ends = {
                str(r.partition): int(r.end)
                for r in batch.groupBy("partition")
                .agg((F.max("offset") + 1).alias("end"))
                .collect()
            }
            merged = dict(man["offsets"].get(name, {}))
            merged.update(ends)
            new_offsets[name] = merged
            if n:
                partials.append(
                    parse_events_json(batch)
                    .groupBy(*self.keys)
                    .agg(
                        F.count(F.lit(1)).alias("n_events"),
                        F.sum("value").alias("sum_value"),
                    )
                    .withColumn("topic", F.lit(name))
                )
            batch.unpersist()
        if total == 0:
            return 0
        delta = partials[0]
        for p in partials[1:]:
            delta = delta.unionByName(p)
        if man["version"] > 0:
            old = self.spark.read.parquet(self._state_dir(man["version"]))
            delta = old.unionByName(delta)
        new_state = delta.groupBy(*self.keys, "topic").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
        new_version = man["version"] + 1
        new_state.write.mode("overwrite").parquet(self._state_dir(new_version))
        self._swap_manifest({"version": new_version, "offsets": new_offsets})
        self._gc(new_version)
        return total

    def _gc(self, current: int) -> None:
        import os
        import shutil

        for v in range(1, current - self.KEEP_VERSIONS + 1):
            d = self._state_dir(v)
            if os.path.exists(d):
                shutil.rmtree(d)

    # -- read -------------------------------------------------------------

    def read_view(self) -> DataFrame:
        """The committed view (manifest version), finalized per (keys, topic)."""
        man = self.manifest()
        if man["version"] == 0:
            return self.spark.createDataFrame(
                [], f"{', '.join(k + ' bigint' for k in self.keys)}, topic string, "
                "n_events bigint, total_value double",
            )
        state = self.spark.read.parquet(self._state_dir(man["version"]))
        return state.select(
            *self.keys,
            "topic",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("sum_value", 2).alias("total_value"),
        )


def domain_wordcount_updater(
    docs_stream: DataFrame, state_path: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain the (source, word) count state behind the domain-drift
    monitor from a live documents stream.

    The incremental-view instance of ``sampling.domain_kl_divergence``:
    counts are MERGEABLE state (sums add), so each micro-batch folds at
    delta-vocabulary cost — union with the stored state, re-aggregate —
    and history is never re-tokenized. Crash-atomicity and replay
    safety both ride on ``TxnView``'s manifest-swap discipline: each
    fold writes a NEW immutable ``v{N}`` state directory and commits by
    atomically replacing one MANIFEST.json that records {version,
    applied_batch} in the SAME write. A crash anywhere before the swap
    leaves the manifest at version N (the half-written v{N+1} is
    invisible, never deleted state); a crash after the swap but before
    Spark checkpoints means the redelivered batch id ≤ applied_batch
    and folds as a no-op — no double count, no lost history.
    """

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fold_domain_wordcounts(batch, state_path, batch_id=batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def _dw_manifest(state_path: str) -> dict:
    import json
    import os

    p = os.path.join(state_path, "MANIFEST.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"version": 0, "applied_batch": -1}


def fold_domain_wordcounts(
    batch: DataFrame, state_path: str, batch_id: int | None = None
) -> bool:
    """Merge one documents delta into the (source, word, cnt) state.

    Same snapshot-manifest commit as ``TxnView``: the new state version
    is written to an immutable ``v{N+1}`` directory, then ONE atomic
    ``os.replace`` of MANIFEST.json records both the new version and
    the applied batch id. There is no window in which a crash can lose
    or double-apply history: before the swap, the manifest still points
    at v{N} (prior counts intact, batch not marked applied → clean
    re-fold); the swap itself is the single commit point for state AND
    the idempotence marker. Returns True iff the delta was folded
    (False = already-applied batch id, a redelivery no-op).
    """
    import json
    import os
    import shutil

    from ..operators.dedup import _words, explode_nonempty

    os.makedirs(state_path, exist_ok=True)
    man = _dw_manifest(state_path)
    if batch_id is not None and batch_id <= man["applied_batch"]:
        return False
    spark = batch.sparkSession
    delta = (
        explode_nonempty(batch, ["source"], _words(F.col("text")), "word")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if man["version"] > 0:
        delta = (
            spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))
            .unionByName(delta)
            .groupBy("source", "word")
            .agg(F.sum("cnt").alias("cnt"))
        )
    new_version = man["version"] + 1
    delta.write.mode("overwrite").parquet(os.path.join(state_path, f"v{new_version}"))
    new_man = {
        "version": new_version,
        "applied_batch": batch_id if batch_id is not None else man["applied_batch"],
    }
    tmp = os.path.join(state_path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(new_man, f)
    os.replace(tmp, os.path.join(state_path, "MANIFEST.json"))  # THE commit
    # GC: keep current + previous for in-flight readers (TxnView rule).
    for v in range(1, new_version - 1):
        d = os.path.join(state_path, f"v{v}")
        if os.path.exists(d):
            shutil.rmtree(d)
    return True


def read_domain_wordcounts(spark: SparkSession, state_path: str) -> DataFrame:
    """The committed (source, word, cnt) state at the manifest version."""
    import os

    man = _dw_manifest(state_path)
    if man["version"] == 0:
        return spark.createDataFrame([], "source string, word string, cnt bigint")
    return spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))


def window_fingerprint_updater(
    docs_stream: DataFrame, state_path: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain the substring-dedup fingerprint index from a live
    documents stream — the incremental state behind
    ``dedup.dedup_window_exact`` at ingest time.

    State is the winner table h → first (doc_id, pos): min(struct) is
    a MERGEABLE aggregate (min of mins), so each micro-batch folds at
    |batch-windows| + |state| cost and history text is never
    re-fingerprinted. A pipeline then screens an incoming doc by
    equi-joining its windows against this table (any hit whose winner
    is another doc ⇒ duplicated span — the same probe shape as
    ``dedup_incremental``). Crash-atomicity and replay safety ride the
    same snapshot-manifest commit as ``fold_domain_wordcounts``.
    """

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fold_window_fingerprints(batch, state_path, batch_id=batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def fold_window_fingerprints(
    batch: DataFrame, state_path: str, batch_id: int | None = None
) -> bool:
    """Merge one documents delta into the h → first (doc_id, pos)
    winner table (manifest-swap commit, see fold_domain_wordcounts)."""
    import json
    import os
    import shutil

    from ..operators.dedup import _words, window_fingerprints

    os.makedirs(state_path, exist_ok=True)
    man = _dw_manifest(state_path)
    if batch_id is not None and batch_id <= man["applied_batch"]:
        return False
    spark = batch.sparkSession
    words = batch.select("doc_id", _words(F.col("text")).alias("words")).filter(
        F.size("words") > 0
    )
    delta = (
        window_fingerprints(words)
        .groupBy("h")
        .agg(F.min(F.struct("doc_id", "pos")).alias("first_at"))
    )
    if man["version"] > 0:
        delta = (
            spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))
            .unionByName(delta)
            .groupBy("h")
            .agg(F.min("first_at").alias("first_at"))
        )
    new_version = man["version"] + 1
    delta.write.mode("overwrite").parquet(os.path.join(state_path, f"v{new_version}"))
    new_man = {
        "version": new_version,
        "applied_batch": batch_id if batch_id is not None else man["applied_batch"],
    }
    tmp = os.path.join(state_path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(new_man, f)
    os.replace(tmp, os.path.join(state_path, "MANIFEST.json"))  # THE commit
    for v in range(1, new_version - 1):
        d = os.path.join(state_path, f"v{v}")
        if os.path.exists(d):
            shutil.rmtree(d)
    return True


def read_window_fingerprints(spark: SparkSession, state_path: str) -> DataFrame:
    """The committed winner table at the manifest version."""
    import os

    man = _dw_manifest(state_path)
    if man["version"] == 0:
        return spark.createDataFrame(
            [], "h string, first_at struct<doc_id: bigint, pos: int>"
        )
    return spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))


def substring_dedup_gate(
    docs_stream: DataFrame,
    state_path: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """The ingest gate: screen each arriving document batch against
    the standing substring-fingerprint index, THEN fold it in.

    Per micro-batch, in order:
    1. probe — the batch's stride-1 window fingerprints equi-join the
       COMMITTED winner table (``read_window_fingerprints``): one
       triage row per batch doc (window count, corpus-hit count,
       clean flag) appended to the parquet audit sink. Cost
       |batch-windows| + state join — the ``dedup_window_incremental``
       shape, live.
    2. fold — ``fold_window_fingerprints`` merges the batch into the
       state (manifest commit, replay-safe), so every LATER batch
       sees these documents as corpus.

    Probing against the pre-batch snapshot makes the gate causally
    consistent under redelivery: a replayed batch probes the state
    that already contains itself, so its docs self-hit — but the fold
    is an applied-batch no-op, and the audit sink is idempotent per
    batch only if the caller dedups on (doc_id); production routes
    the triage rows through ``sinks.idempotent_parquet_sink``. Batch-
    INTERNAL duplicate spans are resolved by the fold's min(struct)
    winner, exactly like the batch operator.
    """
    from ..operators.dedup import _words, window_fingerprints

    def _screen_then_fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        words = batch.select("doc_id", _words(F.col("text")).alias("words")).filter(
            F.size("words") > 0
        )
        wins = window_fingerprints(words)
        idx = read_window_fingerprints(spark, state_path).select(
            "h", F.col("first_at.doc_id").alias("owner")
        )
        hits = wins.join(idx, "h").groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.count_distinct("owner").alias("n_owner_docs"),
        )
        base = wins.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_windows"))
        (
            base.join(hits, "doc_id", "left")
            .select(
                "doc_id",
                F.lit(batch_id).alias("batch_id"),
                F.col("n_windows").cast("long").alias("n_windows"),
                F.coalesce("n_dup_windows", F.lit(0))
                .cast("long")
                .alias("n_dup_windows"),
                F.coalesce("n_owner_docs", F.lit(0))
                .cast("long")
                .alias("n_owner_docs"),
                (F.coalesce("n_dup_windows", F.lit(0)) == 0).alias("clean"),
            )
            .write.mode("append")
            .parquet(out_dir)
        )
        fold_window_fingerprints(batch, state_path, batch_id=batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_screen_then_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def dsir_state_updater(
    docs_stream: DataFrame, state_path: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain the DSIR bucket distributions from a live documents
    stream — the trained-model side of ``sampling.dsir_importance``.

    The hashed-bigram bucket counts (per bucket: raw count + target
    count) are sum-mergeable state bounded by B = DSIR_BUCKETS rows,
    folded per micro-batch at |batch-bigrams| cost under the usual
    snapshot-manifest commit. ``dsir_score_snapshot`` then scores any
    relation against the CURRENT committed distributions — the
    production shape: the importance model updates slowly as corpus
    lands; scoring rides each batch as a B-row broadcast join.
    """

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fold_dsir_state(batch, state_path, batch_id=batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def fold_dsir_state(
    batch: DataFrame, state_path: str, batch_id: int | None = None
) -> bool:
    """Merge one documents delta's hashed-bigram bucket counts."""
    import json
    import os
    import shutil

    from ..operators.dedup import _shingles, _words, explode_nonempty
    from ..operators.sampling import DSIR_BUCKETS, DSIR_TARGET_LANG, _md5_bucket

    os.makedirs(state_path, exist_ok=True)
    man = _dw_manifest(state_path)
    if batch_id is not None and batch_id <= man["applied_batch"]:
        return False
    spark = batch.sparkSession
    tok = batch.select(
        (F.col("lang") == DSIR_TARGET_LANG).cast("int").alias("is_target"),
        _words(F.col("text")).alias("words"),
    )
    delta = (
        explode_nonempty(tok, ["is_target"], _shingles(F.col("words"), k=2), "bg")
        .select("is_target", _md5_bucket(F.col("bg"), DSIR_BUCKETS).alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum("is_target").cast("long").alias("c_t"),
        )
    )
    if man["version"] > 0:
        delta = (
            spark.read.parquet(os.path.join(state_path, f"v{man['version']}"))
            .unionByName(delta)
            .groupBy("b")
            .agg(F.sum("c_r").alias("c_r"), F.sum("c_t").alias("c_t"))
        )
    nv = man["version"] + 1
    delta.write.mode("overwrite").parquet(os.path.join(state_path, f"v{nv}"))
    tmp = os.path.join(state_path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": nv,
                "applied_batch": batch_id if batch_id is not None else man["applied_batch"],
            },
            f,
        )
    os.replace(tmp, os.path.join(state_path, "MANIFEST.json"))  # THE commit
    for v in range(1, nv - 1):
        d = os.path.join(state_path, f"v{v}")
        if os.path.exists(d):
            shutil.rmtree(d)
    return True


def dsir_score_snapshot(
    docs: DataFrame, state_path: str
) -> DataFrame:
    """Score a documents relation against the COMMITTED bucket state.

    Identical arithmetic to the batch ``sampling.dsir_importance``
    (add-one smoothing, integer micro-nat truncation, integer per-doc
    sums) — so state folded from the whole corpus reproduces the
    batch operator's log-weights EXACTLY (pytest-asserted). Output
    schema matches the batch operator.
    """
    import os

    from ..operators.dedup import _shingles, _words, explode_nonempty
    from ..operators.sampling import DSIR_BUCKETS, DSIR_TARGET_LANG, _md5_bucket

    spark = docs.sparkSession
    man = _dw_manifest(state_path)
    if man["version"] == 0:
        raise FileNotFoundError(f"no committed DSIR state in {state_path}")
    buckets_raw = spark.read.parquet(
        os.path.join(state_path, f"v{man['version']}")
    )
    n_t = buckets_raw.agg(F.sum("c_t").alias("n_t"))
    n_r = buckets_raw.agg(F.sum("c_r").alias("n_r"))
    b_mod = DSIR_BUCKETS
    buckets = (
        buckets_raw.crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_r))
        .select(
            "b",
            (
                (
                    F.log((F.col("c_t") + 1).cast("double"))
                    - F.log((F.col("n_t") + b_mod).cast("double"))
                    - F.log((F.col("c_r") + 1).cast("double"))
                    + F.log((F.col("n_r") + b_mod).cast("double"))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("lr_unats"),
        )
    )
    tok = docs.select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).cast("int").alias("is_target"),
        _words(F.col("text")).alias("words"),
    )
    doc_feat = (
        explode_nonempty(tok, ["doc_id"], _shingles(F.col("words"), k=2), "bg")
        .select("doc_id", _md5_bucket(F.col("bg"), b_mod).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        doc_feat.join(F.broadcast(buckets), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            (F.sum(F.col("c") * F.col("lr_unats")) / 1e6).alias("log_weight"),
        )
    )
    return (
        docs.select(
            "doc_id",
            (F.col("lang") == DSIR_TARGET_LANG).cast("int").alias("is_target"),
        )
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
            (F.coalesce("log_weight", F.lit(0.0)) > 0).cast("int").alias("keep"),
        )
    )


def growth_accounting_updater(
    events_stream: DataFrame, state_path: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain daily growth accounting incrementally from a live
    events stream — the incremental-view instance of
    ``behavior.growth_accounting``.

    State (two relations, ONE manifest commit — crash-atomic across
    both, same snapshot discipline as ``fold_domain_wordcounts``):

    - ``users``: per-user last-active day — the ONLY per-user state
      classification needs, because a user's next active day is new /
      retained / resurrected purely from (last_day is null, day −
      last_day == 1, else). O(users), not O(user×days).
    - ``daily``: (day, n_new, n_retained, n_resurrected) counters —
      sum-mergeable, folded per batch at |batch days| cost.

    Correctness contract: per-user day arrival must be non-decreasing
    across batches (event-time order per key — what a keyed topic
    gives you); a day ≤ the user's recorded last_day is a replay and
    folds as a no-op, so redelivery at the day grain is free. True
    late data (an OLD day arriving after a newer one) would need the
    batch operator as backfill — the standard lambda split.
    ``growth_snapshot`` serves the finished decomposition (with churn
    derived exactly as the batch op derives it) from days-sized state.
    """

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        fold_growth_accounting(batch, state_path, batch_id=batch_id)

    return (
        events_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def fold_growth_accounting(
    batch: DataFrame, state_path: str, batch_id: int | None = None
) -> bool:
    """Fold one events delta into the growth-accounting state."""
    import json
    import os
    import shutil

    from pyspark.sql import Window

    os.makedirs(state_path, exist_ok=True)
    man = _dw_manifest(state_path)
    if batch_id is not None and batch_id <= man["applied_batch"]:
        return False
    spark = batch.sparkSession
    v = man["version"]
    if v > 0:
        users = spark.read.parquet(os.path.join(state_path, f"users_v{v}"))
        daily = spark.read.parquet(os.path.join(state_path, f"daily_v{v}"))
    else:
        users = spark.createDataFrame([], "user_id bigint, last_day bigint")
        daily = spark.createDataFrame(
            [],
            "day bigint, n_new bigint, n_retained bigint, n_resurrected bigint",
        )
    batch_days = (
        batch.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .distinct()
        .join(users, "user_id", "left")
        .filter((F.col("last_day").isNull()) | (F.col("day") > F.col("last_day")))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    prev = F.coalesce(F.lag("day").over(w), F.col("last_day"))
    classified = batch_days.select(
        "user_id",
        "day",
        F.when(prev.isNull(), F.lit("new"))
        .when(prev == F.col("day") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("kind"),
    ).localCheckpoint()  # consumed by both folds below
    delta_daily = classified.groupBy("day").agg(
        F.sum((F.col("kind") == "new").cast("long")).alias("n_new"),
        F.sum((F.col("kind") == "retained").cast("long")).alias("n_retained"),
        F.sum((F.col("kind") == "resurrected").cast("long")).alias(
            "n_resurrected"
        ),
    )
    new_daily = (
        daily.unionByName(delta_daily)
        .groupBy("day")
        .agg(
            F.sum("n_new").alias("n_new"),
            F.sum("n_retained").alias("n_retained"),
            F.sum("n_resurrected").alias("n_resurrected"),
        )
    )
    new_users = (
        users.unionByName(
            classified.groupBy("user_id").agg(F.max("day").alias("last_day"))
        )
        .groupBy("user_id")
        .agg(F.max("last_day").alias("last_day"))
    )
    nv = v + 1
    new_daily.write.mode("overwrite").parquet(
        os.path.join(state_path, f"daily_v{nv}")
    )
    new_users.write.mode("overwrite").parquet(
        os.path.join(state_path, f"users_v{nv}")
    )
    tmp = os.path.join(state_path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": nv,
                "applied_batch": batch_id if batch_id is not None else man["applied_batch"],
            },
            f,
        )
    os.replace(tmp, os.path.join(state_path, "MANIFEST.json"))  # THE commit
    for old in range(1, nv - 1):
        for pref in ("daily_v", "users_v"):
            d = os.path.join(state_path, f"{pref}{old}")
            if os.path.exists(d):
                shutil.rmtree(d)
    return True


def growth_snapshot(spark: SparkSession, state_path: str) -> DataFrame:
    """The finished growth decomposition from the maintained state —
    identical schema/semantics to ``behavior.growth_accounting``,
    computed from days-sized state (churn = active(d−1) − retained(d)
    on adjacent calendar days, exactly the batch derivation)."""
    import os

    from pyspark.sql import Window

    man = _dw_manifest(state_path)
    if man["version"] == 0:
        return spark.createDataFrame(
            [],
            "day bigint, n_active bigint, n_new bigint, n_retained bigint, "
            "n_resurrected bigint, n_churned bigint",
        )
    daily = spark.read.parquet(
        os.path.join(state_path, f"daily_v{man['version']}")
    ).withColumn(
        "n_active",
        F.col("n_new") + F.col("n_retained") + F.col("n_resurrected"),
    )
    wd = Window.orderBy("day")
    prev_cal = F.when(
        F.lag("day").over(wd) == F.col("day") - 1, F.lag("n_active").over(wd)
    ).otherwise(F.lit(0))
    return daily.select(
        "day",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_new").cast("long").alias("n_new"),
        F.col("n_retained").cast("long").alias("n_retained"),
        F.col("n_resurrected").cast("long").alias("n_resurrected"),
        (F.coalesce(prev_cal, F.lit(0)) - F.col("n_retained"))
        .cast("long")
        .alias("n_churned"),
    )


def domain_drift_snapshot(spark: SparkSession, state_path: str) -> DataFrame:
    """Per-source KL vs the corpus blend, computed FROM the maintained
    state (vocab-sized read — the corpus is never re-tokenized).

    Same arithmetic as the batch ``domain_kl_divergence`` (so stream
    state ≡ batch output is pytest-assertable), but its input is the
    (source, word, cnt) table ``domain_wordcount_updater`` keeps.
    """
    sw = read_domain_wordcounts(spark, state_path).withColumnRenamed("cnt", "c_sw")
    w = sw.groupBy("word").agg(F.sum("c_sw").alias("c_w"))
    s_tot = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    n_tot = w.agg(F.sum("c_w").alias("n_total"))
    p_s = F.col("c_sw") / F.col("n_s")
    q = F.col("c_w") / F.col("n_total")
    return (
        sw.join(w, "word")
        .join(F.broadcast(s_tot), "source")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.round(F.sum(p_s * F.log(p_s / q)), 4).alias("kl_nats"),
        )
        .orderBy("source")
    )


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


# ---------------------------------------------------------------------------
# change-data-feed consumer: CDF → topic → signed incremental fold
# ---------------------------------------------------------------------------
#
# The lakehouse completion of the reference's changelog pattern (a
# Samza job's KeyValueStore changelog feeds downstream consumers):
# one table's COMMITTED changes — derived by
# ``VersionedMergeTable.read_changes`` with the retraction encoding —
# are published to a ``TopicLog``, and a downstream aggregate folds
# the signed deltas with ``incremental.update_aggregate_signed``.
# Cost per cycle is ∝ the commits since the cursor (the CDF diffs only
# touched buckets), never ∝ the table; the downstream equals the batch
# recompute at every published version (pytest).


def publish_cdf(table, topic: TopicLog, cursor_path: str, key_col: str) -> dict:
    """Publish the table's committed changes since the cursor.

    Bootstrap (cursor absent): version 1's rows are published as
    ``insert`` changes — the initial full load every CDC pipeline
    performs. Thereafter each call publishes
    ``read_changes(cursor, current, include_preimages=True)`` and
    advances the cursor AFTER the produce lands, so a crash between
    produce and cursor write replays the same changes — at-least-once,
    made exact downstream by the consumer's offset commit (the fold
    reads each topic record exactly once per group).
    """
    import json as _json
    import os as _os

    cur = 0
    if _os.path.exists(cursor_path):
        with open(cursor_path) as fh:
            cur = _json.load(fh)["version"]
    current = table.manifest()["current"]
    if cur == 0:
        changes = table.read(version=1).select(
            "*",
            F.lit("insert").alias("_change_type"),
            F.lit(1).cast("long").alias("_commit_version"),
        )
        published_to = 1
    elif current > cur:
        changes = table.read_changes(cur, current, include_preimages=True)
        published_to = current
    else:
        return {"published": 0, "from": cur, "to": cur}
    payload = changes.select(
        F.col(key_col).cast("string").alias("k"),
        F.to_json(F.struct(*changes.columns)).alias("v"),
    )
    n = payload.count()
    topic.produce(payload, "k", "v")
    with open(cursor_path, "w") as fh:
        _json.dump({"version": published_to}, fh)
    return {"published": n, "from": cur, "to": published_to}


def _cdf_watermark_path(state_path: str) -> str:
    return state_path.rstrip("/") + ".watermark.json"


def _cdf_watermark(state_path: str) -> int:
    import json as _json
    import os as _os

    p = _cdf_watermark_path(state_path)
    if _os.path.exists(p):
        with open(p) as fh:
            return _json.load(fh)["version"]
    return 0


def fold_cdf_from_topic(
    spark: SparkSession,
    topic: TopicLog,
    group: str,
    state_path: str,
    change_schema: str,
    keys: list[str],
    value_col: str,
) -> int:
    """One downstream maintenance cycle: drain the group's uncommitted
    CDF records, fold the signed deltas into the aggregate state,
    commit offsets AFTER the state swap (``maintain_view_from_topic``'s
    ordering). Inserts and update postimages weigh +1, deletes and
    update preimages -1 — so updates retract their old contribution
    and the state tracks the table exactly.

    Exactly-once against BOTH replay modes: the offset commit dedupes
    re-CONSUMPTION of the same records, and a COMMIT-VERSION
    WATERMARK dedupes re-PUBLICATION — a publisher that crashed
    between its topic produce and its cursor write re-publishes the
    same versions as fresh records (``publish_cdf`` is at-least-once
    by design), which offsets alone would double-fold. Versions are
    monotone per table and ``publish_cdf`` ships whole versions per
    produce, so filtering to ``_commit_version > watermark`` and
    advancing the watermark after the state swap makes duplicated
    publishes fold nothing (pytest simulates the cursor-loss crash).
    Returns records folded (pre-watermark-filter drain size).
    """
    import json as _json

    batch = topic.read_batch(group).cache()
    n = batch.count()
    if n:
        wm = _cdf_watermark(state_path)
        # a re-publication drained in the SAME batch as the original
        # sits above the watermark too; a version's rows are unique on
        # (key, change_type), so an exact row dedupe collapses the
        # duplicates without touching legitimate changes.
        changes = (
            batch.select(F.from_json(F.col("value"), change_schema).alias("c"))
            .select("c.*")
            .filter(F.col("_commit_version") > wm)
            .dropDuplicates()
        )
        new_wm = changes.agg(F.max("_commit_version")).first()[0]
        if new_wm is not None:
            signed = changes.withColumn(
                "_sign",
                F.when(
                    F.col("_change_type").isin("insert", "update_postimage"),
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            )
            update_aggregate_signed(
                spark, state_path, signed, keys=keys, value_col=value_col
            )
            with open(_cdf_watermark_path(state_path), "w") as fh:
                _json.dump({"version": int(new_wm)}, fh)
        ends = (
            batch.groupBy("partition").agg((F.max("offset") + 1).alias("end")).collect()
        )
        topic.commit(group, {str(r.partition): int(r.end) for r in ends})
    batch.unpersist()
    return n


def apply_cdf_to_join_mv(
    spark: SparkSession,
    topic: TopicLog,
    group: str,
    mv_table,
    dim_df: DataFrame,
    key_col: str,
    change_schema: str,
) -> int:
    """One streaming JOIN-MV maintenance cycle: drain the group's
    uncommitted CDF records, NET them per key, re-enrich ONLY the
    changed keys via a broadcast dim join, and apply to the MV
    merge-table — the continuous twin of the batch
    ``merge.orders_cdf_join_mv`` build, fed by ``publish_cdf``'s
    topic instead of a direct ``read_changes`` read.

    Exactness layers, weakest assumption first:

    - ROW-LEVEL apply is naturally idempotent: netting takes the
      highest ``_commit_version`` per key, so re-applying an
      already-folded change upserts a key to the value it already has
      (or re-deletes an absent key — the delete-marked merge inserts
      nothing). Unlike the signed aggregate fold, no watermark is
      NEEDED for correctness under re-publication.
    - The two merges still carry ``txn=`` watermarks (app ids
      ``{group}:ups`` / ``{group}:dels`` at the drained max commit
      version), so an exact replay of a committed batch writes no new
      table version at all — the ledger stays clean, not just the
      rows. A crash BETWEEN the merges re-runs the cycle: the upsert
      leg no-ops on its watermark, the delete leg completes.
    - Offsets commit AFTER both merges (at-least-once upgraded to
      exactly-once by the two layers above).

    Preimages are dropped (``update_preimage`` rows retract aggregate
    contributions; a keyed MV needs only postimages + deletes). Cost
    per cycle: |drained records| + the touched MV buckets — never the
    base table, never the full view.
    """
    from pyspark.sql import Window

    batch = topic.read_batch(group).cache()
    n = batch.count()
    if n:
        changes = (
            batch.select(F.from_json(F.col("value"), change_schema).alias("c"))
            .select("c.*")
            .filter(F.col("_change_type") != "update_preimage")
            .dropDuplicates()  # re-published versions in the same drain
        )
        w = Window.partitionBy(key_col).orderBy(F.col("_commit_version").desc())
        net = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .localCheckpoint()
        )
        vmax = net.agg(F.max("_commit_version")).first()[0]
        payload = [
            c
            for c in net.columns
            if c not in ("_change_type", "_commit_version", "_rn")
        ]
        ups = net.filter(F.col("_change_type") != "delete").select(*payload)
        dels = net.filter(F.col("_change_type") == "delete").select(*payload)
        mv_table.merge(
            dim_df.join(F.broadcast(ups), key_col),
            txn=(f"{group}:ups", int(vmax)),
        )
        mv_table.merge(
            dim_df.join(F.broadcast(dels), key_col),
            delete_cond=F.lit(True),
            txn=(f"{group}:dels", int(vmax)),
        )
        ends = (
            batch.groupBy("partition").agg((F.max("offset") + 1).alias("end")).collect()
        )
        topic.commit(group, {str(r.partition): int(r.end) for r in ends})
    batch.unpersist()
    return n


# ---------------------------------------------------------------------------
# composed ANN drift maintenance: IVF rebalance + PQ retrain in one job
# ---------------------------------------------------------------------------


def ann_drift_maintenance(
    spark: SparkSession,
    ivf_index_dir: str,
    pq_index_dir: str,
    vectors: DataFrame,
    vacuum: bool = False,
) -> dict:
    """One maintenance cycle closing the drift story (§7.19): re-train
    the IVF partitioning, then re-fit the PQ codes, against the SAME
    current corpus — the two serving projections a vector store keeps
    over one base table.

    Each pass publishes its own retire-commit
    (``rebalance_ivf_index`` / ``retrain_pq_index`` — new files +
    centroid/codebook pointer swapped atomically, old file set
    retired), so a probe pinned to either index's pre-cycle manifest
    keeps its coherent old layout (pytest-asserted across BOTH
    indexes), and a crash between the passes leaves two
    independently-consistent indexes — the IVF one maintained, the PQ
    one simply still due. ``vacuum=True`` additionally reclaims both
    retired file sets; leave it False (default) unless no reader can
    be pinned to a pre-cycle manifest (the Delta VACUUM grace-period
    contract). Single-maintainer, like its two component passes.

    Cost: the rebalance is one corpus pass + nlist×dim driver rows;
    the retrain is one bounded KMV sample collect + one Arrow-batched
    re-encode pass — both ∝ corpus, never corpus², and nothing
    driver-side scales with the corpus.
    """
    from ..operators.ann_index import (
        rebalance_ivf_index,
        retrain_pq_index,
        vacuum_index,
    )

    ivf_stats = rebalance_ivf_index(spark, ivf_index_dir)
    pq_stats = retrain_pq_index(spark, pq_index_dir, vectors)
    out = {"ivf": ivf_stats, "pq": pq_stats, "vacuumed": 0}
    if vacuum:
        import os as _os

        out["vacuumed"] = vacuum_index(
            _os.path.join(ivf_index_dir, "corpus")
        ) + vacuum_index(_os.path.join(pq_index_dir, "codes"))
    return out


def ann_cdc_apply(
    spark: SparkSession,
    table,
    index_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
    transform=None,
) -> dict:
    """Fold a base table's committed changes into its IVF index — the
    CDC consumer for the vector store (embeddings live in a
    ``VersionedMergeTable``; every MERGE/DELETE commit flows into the
    serving index incrementally, never via full rebuild).

    Protocol: the index manifest carries a ``cdc_cursor`` (the last
    table version applied). Each apply reads
    ``table.read_changes(cursor, to_version)``, reduces the range to
    ONE net change per key (latest ``_commit_version`` wins — an id
    updated five times upserts once; inserted-then-deleted deletes
    once), applies deletes as a tombstone commit and inserts/updates
    as ONE copy-on-write ``upsert_ivf_vectors`` commit, then advances
    the cursor in a final commit. Exactly-once under replay: a crash
    anywhere re-applies the same net changes (tombstones and COW
    upserts are idempotent) and only the final commit moves the
    cursor; a replay at or behind the cursor is a no-op.

    ``transform`` (optional) maps the change frame's payload onto the
    index layout (column renames / array casts); it must yield the
    stored payload columns (``vec_id``, ``v``, attrs). The first
    apply must pass ``from_version`` (the table version the index was
    built from); later applies resume from the stored cursor.

    Scale shape: everything is change-batch-sized — read_changes
    reads only touched buckets, the net-change window partitions by
    key over the change rows, deletes collect a batch-bounded id
    list, and the upsert's COW rewrite touches only files holding
    changed ids. Single-maintainer, like every index writer.
    """
    import os as _os

    from pyspark.sql import Window

    from ..operators.ann_index import (
        commit_index_files,
        delete_ivf_vectors,
        read_index_manifest,
        upsert_ivf_vectors,
    )

    corpus_dir = _os.path.join(index_dir, "corpus")
    man = read_index_manifest(corpus_dir)
    if not man["files"]:
        raise FileNotFoundError(f"no committed snapshot in {corpus_dir}")
    cursor = man.get("cdc_cursor", from_version)
    if cursor is None:
        raise ValueError(
            "index has no cdc_cursor yet; pass from_version (the table "
            "version the index was built from) on the first apply"
        )
    if to_version is None:
        to_version = table.versions()[-1]
    if to_version <= cursor:
        return {"applied": 0, "cursor": cursor, "n_deleted": 0, "n_upserted": 0}

    key = table.key_col
    ch = table.read_changes(cursor, to_version)
    w = Window.partitionBy(key).orderBy(F.col("_commit_version").desc())
    last = (
        ch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint()  # two consumers below; also bounds lineage
    )

    dels = [r[0] for r in last.filter(F.col("_change_type") == "delete").select(key).collect()]
    ups = last.filter(F.col("_change_type") != "delete").drop(
        "_change_type", "_commit_version"
    )
    if transform is not None:
        ups = transform(ups)

    n_deleted = delete_ivf_vectors(spark, index_dir, dels) if dels else 0
    n_upserted = 0
    if ups.limit(1).count():
        upsert_ivf_vectors(spark, index_dir, ups)
        n_upserted = ups.count()

    cur = read_index_manifest(corpus_dir)
    commit_index_files(corpus_dir, cur["files"], extra={"cdc_cursor": to_version})
    return {
        "applied": to_version - cursor,
        "cursor": to_version,
        "n_deleted": n_deleted,
        "n_upserted": n_upserted,
    }

"""MERGE INTO: model equivalence, delete clause, bucket-pruned rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from samza_hello_samza_spark.sources.merge import MergeTable


@pytest.fixture()
def table(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"), "k", n_buckets=8)
    base = spark.createDataFrame(
        [(i, f"v{i}", "open") for i in range(200)], "k long, v string, status string"
    )
    t.write_full(base)
    return t


def test_merge_matches_model(spark, table):
    """Upserts + deletes against a driver-side dict model."""
    model = {i: (f"v{i}", "open") for i in range(200)}
    src = spark.createDataFrame(
        # updates 0..49, inserts 500..519, closes (deletes) 100..109
        [(i, f"NEW{i}", "open") for i in range(50)]
        + [(i, f"v{i}", "closed") for i in range(100, 110)]
        + [(i, f"ins{i}", "open") for i in range(500, 520)],
        "k long, v string, status string",
    )
    stats = table.merge(src, delete_cond=F.col("s.status") == "closed")
    for i in range(50):
        model[i] = (f"NEW{i}", "open")
    for i in range(100, 110):
        del model[i]
    for i in range(500, 520):
        model[i] = (f"ins{i}", "open")

    got = {r.k: (r.v, r.status) for r in table.read().collect()}
    assert got == model
    assert stats["inserted"] == 20
    assert stats["updated"] == 50
    assert stats["deleted"] == 10


def test_merge_is_idempotent_for_pure_updates(spark, table):
    src = spark.createDataFrame([(1, "X", "open")], "k long, v string, status string")
    table.merge(src)
    before = {r.k: r.v for r in table.read().collect()}
    table.merge(src)
    after = {r.k: r.v for r in table.read().collect()}
    assert before == after


def test_merge_schema_evolution_adds_column(spark, table):
    """A superset-schema source widens the table: new column lands on
    merged rows, reads back NULL for untouched rows/buckets, and the
    whole table round-trips through a further ordinary merge."""
    src = spark.createDataFrame(
        [(1, "X1", "open", 9.5), (500, "ins", "open", 1.25)],
        "k long, v string, status string, score double",
    )
    stats = table.merge(src)
    assert stats["inserted"] == 1 and stats["updated"] == 1
    got = {r.k: (r.v, r.score) for r in table.read().collect()}
    assert got[1] == ("X1", 9.5)
    assert got[500] == ("ins", 1.25)
    # a row in a bucket the merge never touched: column exists, NULL
    untouched = [k for k in got if k not in (1, 500)]
    assert untouched and all(got[k][1] is None for k in untouched)
    assert len(got) == 201

    # subsequent merge with the WIDENED schema is now the norm
    src2 = spark.createDataFrame(
        [(2, "X2", "open", None)],
        "k long, v string, status string, score double",
    )
    table.merge(src2)
    got2 = {r.k: (r.v, r.score) for r in table.read().collect()}
    assert got2[2] == ("X2", None) and got2[1] == ("X1", 9.5)


def test_merge_rejects_source_missing_table_columns(spark, table):
    src = spark.createDataFrame([(1, "X")], "k long, v string")
    with pytest.raises(ValueError, match="missing table columns"):
        table.merge(src)


def test_merge_rejects_retyped_columns(spark, table):
    src = spark.createDataFrame(
        [(1, 7, "open")], "k long, v int, status string"
    )
    with pytest.raises(ValueError, match="re-types"):
        table.merge(src)


def test_merge_rejects_duplicate_source_keys(spark, table):
    dup = spark.createDataFrame(
        [(1, "a", "open"), (1, "b", "open")], "k long, v string, status string"
    )
    with pytest.raises(ValueError, match="key-unique"):
        table.merge(dup)


def test_merge_rejects_null_source_keys(spark, table):
    src = spark.createDataFrame(
        [(None, "a", "open"), (2, "b", "open")], "k long, v string, status string"
    )
    with pytest.raises(ValueError, match="key-unique"):
        table.merge(src)


def test_merge_update_can_set_column_to_null(spark, table):
    """SQL-MERGE source-wins: a matched source row with a NULL column
    must null the target column, not resurrect the stale value."""
    src = spark.createDataFrame([(7, None, "open")], "k long, v string, status string")
    table.merge(src)
    row = {r.k: (r.v, r.status) for r in table.read().collect()}[7]
    assert row == (None, "open")


def test_untouched_buckets_not_rewritten(spark, table):
    """A one-key merge must rewrite only that key's bucket directory —
    every other bucket's files stay byte-identical."""
    import hashlib
    import os

    def digest(files_by_bucket):
        out = {}
        for b, files in files_by_bucket.items():
            h = hashlib.md5()
            for f in files:
                h.update(
                    open(os.path.join(table.path, f"_bucket={b}", f), "rb").read()
                )
            out[b] = (tuple(files), h.hexdigest())
        return out

    before = digest(table.bucket_files())
    src = spark.createDataFrame([(7, "ONLY", "open")], "k long, v string, status string")
    stats = table.merge(src)
    assert len(stats["buckets"]) == 1
    touched = stats["buckets"][0]
    after = digest(table.bucket_files())
    assert set(before) == set(after)
    for b in before:
        if b == touched:
            assert before[b] != after[b]
        else:
            assert before[b] == after[b], f"bucket {b} rewritten needlessly"
    assert {r.v for r in table.read().filter(F.col("k") == 7).collect()} == {"ONLY"}


def test_merge_read_prunes_to_touched_buckets(spark, table):
    """The target read inside merge() carries a partition filter on the
    touched buckets."""
    src = spark.createDataFrame([(7, "x", "open")], "k long, v string, status string")
    b = src.select(
        F.pmod(F.xxhash64(F.col("k").cast("string")), F.lit(table.n_buckets)).cast("int").alias("b")
    ).collect()[0].b
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    pruned = spark.read.parquet(table.path).filter(F.col("_bucket").isin([b]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(rf"PartitionFilters: \[[^\]]*_bucket#\d+ = {b}", plan), plan[:1200]


def test_cdc_apply_job_end_to_end(spark, tmp_path):
    """Changelog topic → MergeTable: upserts land, tombstones delete,
    and replaying the WHOLE topic from offset 0 (fresh checkpoint)
    leaves the table unchanged — CDC apply is idempotent."""
    from samza_hello_samza_spark.sources.topic_log import TopicLog
    from samza_hello_samza_spark.streaming import maintenance

    table = MergeTable(spark, str(tmp_path / "tbl"), "k", n_buckets=4)
    table.write_full(
        spark.createDataFrame([(f"k{i}", f"init{i}") for i in range(20)], "k string, v string")
    )
    topic = TopicLog(spark, str(tmp_path / "topic"), n_partitions=2)
    topic.produce(
        spark.createDataFrame(
            [(f"k{i}", f"upd{i}") for i in range(5)]  # updates
            + [("k100", "new100"), ("k101", "new101")],  # inserts
            "k string, v string",
        ),
        "k",
        "v",
    )
    topic.produce(
        spark.createDataFrame(
            [("k3", None), ("k100", None), ("k0", "upd0.final")],
            "k string, v string",
        ),
        "k",
        "v",
    )

    q = maintenance.cdc_apply_job(topic, table, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    model = {f"k{i}": f"init{i}" for i in range(20)}
    for i in range(5):
        model[f"k{i}"] = f"upd{i}"
    model["k101"] = "new101"
    model["k0"] = "upd0.final"
    del model["k3"]  # tombstoned; k100 inserted then tombstoned

    got = {r.k: r.v for r in table.read().select("k", "v").collect()}
    assert got == model

    # full replay on a fresh checkpoint: nothing may change
    q2 = maintenance.cdc_apply_job(topic, table, str(tmp_path / "ckpt2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = {r.k: r.v for r in table.read().select("k", "v").collect()}
    assert again == model


# -- VersionedMergeTable: snapshot isolation + time travel -------------------


from samza_hello_samza_spark.sources.merge import VersionedMergeTable


@pytest.fixture()
def vtable(spark, tmp_path):
    t = VersionedMergeTable(spark, str(tmp_path / "vt"), "k", n_buckets=8)
    base = spark.createDataFrame(
        [(i, f"v{i}", "open") for i in range(200)], "k long, v string, status string"
    )
    t.write_full(base)
    return t


def test_versioned_merge_matches_model_with_time_travel(spark, vtable):
    """Same model equivalence as MergeTable, plus every historical
    version stays readable and unchanged after later merges."""
    v1 = {r.k: (r.v, r.status) for r in vtable.read().collect()}
    assert len(v1) == 200 and vtable.manifest()["current"] == 1

    src = spark.createDataFrame(
        [(i, f"NEW{i}", "open") for i in range(50)]
        + [(i, f"v{i}", "closed") for i in range(100, 110)]
        + [(i, f"ins{i}", "open") for i in range(500, 520)],
        "k long, v string, status string",
    )
    stats = vtable.merge(src, delete_cond=F.col("s.status") == "closed")
    assert stats["version"] == 2
    assert (stats["inserted"], stats["updated"], stats["deleted"]) == (20, 50, 10)

    model = dict(v1)
    for i in range(50):
        model[i] = (f"NEW{i}", "open")
    for i in range(100, 110):
        del model[i]
    for i in range(500, 520):
        model[i] = (f"ins{i}", "open")
    got2 = {r.k: (r.v, r.status) for r in vtable.read().collect()}
    assert got2 == model

    # time travel: v1 still exactly the original table
    got1 = {r.k: (r.v, r.status) for r in vtable.read(version=1).collect()}
    assert got1 == v1
    assert vtable.versions() == [1, 2]


def test_versioned_merge_never_rewrites_untouched_files(spark, vtable):
    """Old version directories are immutable: a merge adds a new
    version dir and leaves every existing file byte-identical."""
    import os

    def snapshot_files(root):
        out = {}
        for dirpath, _d, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out[p] = os.path.getsize(p)
        return out

    before = snapshot_files(vtable.path)
    vtable.merge(
        spark.createDataFrame([(1, "X", "open")], "k long, v string, status string")
    )
    after = snapshot_files(vtable.path)
    for p, size in before.items():
        assert after.get(p) == size, f"immutable file rewritten: {p}"
    assert len(after) > len(before)


def test_versioned_merge_crash_before_commit_is_invisible(spark, vtable):
    """An orphan data/v2 directory (merge crashed before the manifest
    swap) must be invisible to readers, and the next merge must land
    cleanly over it."""
    orphan = vtable._data_dir(2)
    spark.createDataFrame(
        [(9999, "GHOST", "open", 3)], "k long, v string, status string, _bucket int"
    ).write.mode("overwrite").partitionBy("_bucket").parquet(orphan)

    got = {r.k for r in vtable.read().collect()}
    assert 9999 not in got and vtable.manifest()["current"] == 1

    stats = vtable.merge(
        spark.createDataFrame([(2, "Y", "open")], "k long, v string, status string")
    )
    assert stats["version"] == 2
    after = {r.k: r.v for r in vtable.read().collect()}
    assert after[2] == "Y" and 9999 not in after


def test_versioned_merge_schema_evolution_across_versions(spark, vtable):
    """A widening merge adds the column for its rows; reads of ANY
    version mixing old and new writer dirs null-fill the gap; old
    snapshots don't grow the column at all."""
    src = spark.createDataFrame(
        [(1, "X1", "open", 9.5)], "k long, v string, status string, score double"
    )
    vtable.merge(src)
    got = {r.k: r.score for r in vtable.read().collect()}
    assert got[1] == 9.5
    others = [k for k in got if k != 1]
    assert others and all(got[k] is None for k in others)
    assert "score" not in vtable.read(version=1).columns


def test_versioned_merge_empty_bucket_leaves_snapshot(spark, tmp_path):
    """Deleting every row of a bucket removes that bucket from the new
    snapshot (no dangling pointer), while the prior version still
    serves it."""
    t = VersionedMergeTable(spark, str(tmp_path / "vt2"), "k", n_buckets=4)
    base = spark.createDataFrame(
        [(i, "x", "open") for i in range(8)], "k long, v string, status string"
    )
    t.write_full(base)
    # tombstone EVERY existing row → some buckets must empty out
    tomb = spark.createDataFrame(
        [(i, "x", "closed") for i in range(8)], "k long, v string, status string"
    )
    stats = t.merge(tomb, delete_cond=F.col("s.status") == "closed")
    assert stats["deleted"] == 8
    snap2 = t.manifest()["snapshots"]["2"]
    assert snap2 == {}  # all buckets emptied and dropped
    with pytest.raises(FileNotFoundError):
        t.read()  # current snapshot holds nothing
    assert {r.k for r in t.read(version=1).collect()} == set(range(8))


# -- property-based model equivalence + time travel (hypothesis) -------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    # an action: list of (key, value, op) with op ∈ upsert/delete
    _batch_st = st.lists(
        st.tuples(
            st.integers(0, 12),
            st.text(alphabet="abc", min_size=1, max_size=2),
            st.sampled_from(["upsert", "delete"]),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],  # MERGE sources must be key-unique
    )

    @given(batches=st.lists(_batch_st, min_size=1, max_size=4))
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_versioned_merge_model_and_history_under_random_batches(
        spark, tmp_path_factory, batches
    ):
        """For ANY sequence of key-unique upsert/delete batches: the
        current table equals a dict model, and EVERY historical
        version still reads back exactly as it was at its commit."""
        import tempfile

        root = tempfile.mkdtemp(
            prefix="hypvmt", dir=str(tmp_path_factory.getbasetemp())
        )
        t = VersionedMergeTable(spark, root, "k", n_buckets=4)
        t.write_full(
            spark.createDataFrame(
                [(i, "init", "open") for i in range(5)],
                "k long, v string, status string",
            )
        )
        model = {i: ("init", "open") for i in range(5)}
        history = {1: dict(model)}

        for batch in batches:
            src = spark.createDataFrame(
                [
                    (k, v, "closed" if op == "delete" else "open")
                    for k, v, op in batch
                ],
                "k long, v string, status string",
            )
            stats = t.merge(src, delete_cond=F.col("s.status") == "closed")
            for k, v, op in batch:
                if op == "delete":
                    model.pop(k, None)
                else:
                    model[k] = (v, "open")
            history[stats["version"]] = dict(model)

        for version, snap in history.items():
            if not snap:
                with pytest.raises(FileNotFoundError):
                    t.read(version=version)
                continue
            got = {
                r.k: (r.v, r.status)
                for r in t.read(version=version).collect()
            }
            assert got == snap, f"version {version} drifted"


def test_versioned_merge_readers_survive_concurrent_commits(spark, vtable):
    """A reader that resolved its snapshot BEFORE a merge must still
    collect the old version's exact rows afterwards — writers never
    block or break readers because no committed file is ever deleted
    or rewritten."""
    reader = vtable.read(version=1)  # lazy plan pinned to v1's files
    expected = {(r.k, r.v) for r in vtable.read(version=1).collect()}
    vtable.merge(
        spark.createDataFrame(
            [(i, f"W{i}", "open") for i in range(0, 200, 3)],
            "k long, v string, status string",
        )
    )
    vtable.merge(
        spark.createDataFrame([(7, "X", "open")], "k long, v string, status string")
    )
    # the pre-merge plan still reads v1 exactly
    assert {(r.k, r.v) for r in reader.collect()} == expected
    assert vtable.manifest()["current"] == 3


def test_merge_bootstrap_only_when_table_truly_missing(spark, tmp_path):
    """The bootstrap path (empty target, all inserts) fires for a
    missing/empty table dir; an UNREADABLE table (corrupt footer,
    IO failure) must raise, never silently treat the target as empty
    — that would dynamic-overwrite matched rows with source-only
    buckets (ADVICE r04)."""
    import os

    # genuinely-new table: first merge defines schema, all inserts
    t = MergeTable(spark, str(tmp_path / "fresh"), "k", n_buckets=4)
    src = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    stats = t.merge(src)
    assert stats["inserted"] == 2 and stats["updated"] == 0
    assert {r.k for r in t.read().collect()} == {1, 2}

    # corrupt table: a garbage "parquet" file must fail the merge loudly
    bad_dir = str(tmp_path / "corrupt")
    os.makedirs(os.path.join(bad_dir, "_bucket=0"))
    with open(os.path.join(bad_dir, "_bucket=0", "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")
    bad = MergeTable(spark, bad_dir, "k", n_buckets=4)
    with pytest.raises(Exception) as ei:
        bad.merge(src)
    # and the garbage file must still be there — nothing was overwritten
    assert os.path.exists(os.path.join(bad_dir, "_bucket=0", "part-00000.parquet"))
    assert "PATH_NOT_FOUND" not in str(ei.value)


def test_versioned_merge_second_writer_fails_loudly(spark, vtable):
    """Two writers that both read current=N cannot both commit N+1:
    the version claim is O_EXCL, so the second merge raises having
    written nothing, and the survivor's snapshot is intact."""
    import os

    # simulate writer A having claimed v2 (claim precedes any data write)
    claim = os.path.join(vtable.path, "v2.claim")
    open(claim, "x").close()

    src = spark.createDataFrame([(5, "B", "open")], "k long, v string, status string")
    with pytest.raises(RuntimeError, match="claimed version 2"):
        vtable.merge(src)
    assert vtable.manifest()["current"] == 1  # nothing committed
    before = {r.k: r.v for r in vtable.read().collect()}
    assert before[5] == "v5"  # loser wrote nothing visible

    # writer A releases (crash recovery: operator removes stale claim)
    os.remove(claim)
    stats = vtable.merge(src)
    assert stats["version"] == 2
    assert {r.k: r.v for r in vtable.read().collect()}[5] == "B"


def test_merge_with_retry_serializes_contending_writers(spark, vtable):
    """The multi-writer queue: three writers merge CONCURRENTLY through
    ``merge_with_retry``; every writer eventually commits its own
    version, and the final table equals replaying the three sources
    in commit (version) order — a serializable history."""
    import threading

    sources = {
        "A": [(1, "A1", "open"), (500, "A", "open")],
        "B": [(2, "B2", "open"), (500, "B", "open")],
        "C": [(3, "C3", "open"), (500, "C", "open")],
    }
    results: dict[str, dict] = {}
    errors: list[Exception] = []

    def run(name):
        try:
            src = spark.createDataFrame(
                sources[name], "k long, v string, status string"
            )
            results[name] = vtable.merge_with_retry(src)
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors.append(e)

    threads = [threading.Thread(target=run, args=(n,)) for n in sources]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    # each writer committed exactly one distinct version: 2, 3, 4
    assert sorted(r["version"] for r in results.values()) == [2, 3, 4]
    assert vtable.manifest()["current"] == 4

    final = {r.k: r.v for r in vtable.read().collect()}
    assert final[1] == "A1" and final[2] == "B2" and final[3] == "C3"
    # the shared key 500 holds the LAST committer's value (version order)
    last = max(results, key=lambda n: results[n]["version"])
    assert final[500] == last
    # history: each intermediate snapshot is still readable and contains
    # exactly the writers committed up to that version
    for v in (2, 3, 4):
        snap = {r.k: r.v for r in vtable.read(version=v).collect()}
        committed = [n for n in results if results[n]["version"] <= v]
        assert {snap[sources[n][0][0]] for n in committed} == {
            sources[n][0][1] for n in committed
        }


def test_merge_with_retry_breaks_stale_claim(spark, vtable):
    """A claim whose writer died before committing must not wedge the
    queue: after max_wait_s without manifest progress the claim is
    broken and the merge retried."""
    import os

    open(os.path.join(vtable.path, "v2.claim"), "x").close()  # dead writer
    src = spark.createDataFrame([(7, "R", "open")], "k long, v string, status string")
    stats = vtable.merge_with_retry(src, max_wait_s=0.3, poll_s=0.05)
    assert stats["version"] == 2 and stats["retries"] >= 1
    assert {r.k: r.v for r in vtable.read().collect()}[7] == "R"


def test_broken_claim_writer_never_contaminates_retaker(spark, vtable):
    """The ADVICE r05 multi-writer hole: a SLOW writer whose claim is
    broken as stale must never land rows in the retaker's committed
    ``data/v{N}``. Writers stage into a claimant-unique directory and
    re-verify claim ownership before the publish rename — simulated
    here step-by-step: A claims v2 and finishes its staging write,
    the claim is broken and B commits v2, then A's publish must abort,
    remove its staging output, and leave B's v2 untouched."""
    import os

    # writer A: claim v2, stage its data (the slow write completes)
    nonce_a = vtable._claim(2)
    rows_a = spark.createDataFrame(
        [(900, "A-LATE", "open", 0)], "k long, v string, status string, _bucket int"
    )
    stage_a = vtable._stage_dir(vtable._data_dir(2), nonce_a)
    rows_a.write.mode("overwrite").partitionBy("_bucket").parquet(stage_a)

    # the queue breaks A's claim as stale; writer B retakes and commits v2
    os.remove(os.path.join(vtable.path, "v2.claim"))
    src_b = spark.createDataFrame(
        [(901, "B-WIN", "open")], "k long, v string, status string"
    )
    stats_b = vtable.merge(src_b)
    assert stats_b["version"] == 2

    # A wakes up past its claim: publish must abort without touching v2
    with pytest.raises(RuntimeError, match="broken as stale|already committed"):
        vtable._publish(2, nonce_a, vtable._data_dir(2))
    assert not os.path.exists(stage_a)  # staging output removed
    v2 = {r.k: r.v for r in vtable.read(version=2).collect()}
    assert v2[901] == "B-WIN" and 900 not in v2  # no contamination

    # and A's ordinary retry path serializes cleanly after B
    stats_a = vtable.merge_with_retry(
        spark.createDataFrame([(900, "A-RETRY", "open")],
                              "k long, v string, status string")
    )
    assert stats_a["version"] == 3
    assert {r.k: r.v for r in vtable.read().collect()}[900] == "A-RETRY"


def test_orphan_data_dir_from_dead_claimant_is_cleared(spark, vtable):
    """A claimant that renamed its staging dir but died before the
    manifest swap leaves an UNREFERENCED ``data/v{N}``; the next claim
    owner clears it inside publish instead of wedging or unioning the
    orphan rows into its commit."""
    import os

    orphan = vtable._data_dir(2)
    os.makedirs(os.path.join(orphan, "_bucket=0"))
    open(os.path.join(orphan, "_bucket=0", "junk.parquet"), "w").close()
    assert vtable.manifest()["current"] == 1  # never committed

    src = spark.createDataFrame(
        [(910, "FRESH", "open")], "k long, v string, status string"
    )
    stats = vtable.merge(src)
    assert stats["version"] == 2
    assert not os.path.exists(os.path.join(orphan, "_bucket=0", "junk.parquet"))
    assert {r.k: r.v for r in vtable.read().collect()}[910] == "FRESH"


def test_merge_with_retry_no_starvation_under_sustained_contention(spark, vtable):
    """Fairness probe: four writers each push three sequential merges
    through the queue concurrently; every one of the 12 merges must
    commit (progress-gated retry cannot starve a writer), versions are
    exactly 2..13, and each writer's own key reflects its LAST merge."""
    import threading

    errors: list[Exception] = []
    versions: dict[str, list[int]] = {n: [] for n in "ABCD"}

    def run(name):
        try:
            for i in range(3):
                src = spark.createDataFrame(
                    [(ord(name), f"{name}{i}", "open")],
                    "k long, v string, status string",
                )
                out = vtable.merge_with_retry(src)
                versions[name].append(out["version"])
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors.append(e)

    threads = [threading.Thread(target=run, args=(n,)) for n in "ABCD"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    all_versions = sorted(v for vs in versions.values() for v in vs)
    assert all_versions == list(range(2, 14))  # 12 commits, none lost
    for name, vs in versions.items():
        assert vs == sorted(vs), f"{name} committed out of order: {vs}"
    final = {r.k: r.v for r in vtable.read().collect()}
    for name in "ABCD":
        assert final[ord(name)] == f"{name}2", name


# -- deletion vectors, change data feed, retention ---------------------------


def _data_file_bytes(root):
    import hashlib
    import os

    out = {}
    for dirpath, _, files in os.walk(os.path.join(root, "data")):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def test_delete_where_rewrites_no_data_file(spark, vtable):
    """A DV delete must leave every data file byte-identical — the
    whole point of the design — while the read subtracts the rows."""
    before = _data_file_bytes(vtable.path)
    out = vtable.delete_where(F.col("k") % 10 == 3)
    assert out["deleted"] == 20 and out["version"] == 2
    assert _data_file_bytes(vtable.path) == before

    got = sorted(r.k for r in vtable.read().collect())
    assert got == sorted(k for k in range(200) if k % 10 != 3)
    # time travel: the pre-delete snapshot still shows every row
    assert vtable.read(version=1).count() == 200


def test_delete_where_composes_and_merge_materializes(spark, vtable):
    """Stacked DVs subtract cumulatively; a MERGE that rewrites a
    bucket clears its DV entries and the deleted keys stay deleted
    (they were subtracted from the merge's target read). A deleted key
    can then be re-inserted by a later merge."""
    vtable.delete_where(F.col("k") < 20)
    vtable.delete_where((F.col("k") >= 20) & (F.col("k") < 30))
    assert sorted(r.k for r in vtable.read().collect()) == list(range(30, 200))

    src = spark.createDataFrame(
        [(5, "resurrected", "open"), (150, "updated", "open")],
        "k long, v string, status string",
    )
    out = vtable.merge(src)
    got = {r.k: r.v for r in vtable.read().collect()}
    assert got[5] == "resurrected" and got[150] == "updated"
    assert sorted(got) == [5] + list(range(30, 200))
    # the touched buckets' DV entries are gone from the new snapshot
    man = vtable.manifest()
    dvs = man["deletes"][str(man["current"])]
    for b in out["buckets"]:
        assert str(b) not in dvs


def test_compact_deletes_materializes_and_preserves_history(spark, vtable):
    vtable.delete_where(F.col("k") % 2 == 0)
    want = sorted(r.k for r in vtable.read().collect())
    out = vtable.compact_deletes()
    assert out["version"] == 3 and out["buckets"]
    man = vtable.manifest()
    assert man["deletes"][str(man["current"])] == {}
    assert sorted(r.k for r in vtable.read().collect()) == want
    # pre-compaction snapshots unchanged
    assert vtable.read(version=1).count() == 200
    assert vtable.read(version=2).count() == 100


def test_compact_deletes_drops_fully_tombstoned_bucket(spark, tmp_path):
    t = VersionedMergeTable(spark, str(tmp_path / "vt2"), "k", n_buckets=4)
    t.write_full(
        spark.createDataFrame([(i, i * 2) for i in range(40)], "k long, x long")
    )
    t.delete_where(F.lit(True))  # tombstone everything
    assert t.read().count() == 0  # rows all subtracted, buckets remain
    t.compact_deletes()
    man = t.manifest()
    assert man["snapshots"][str(man["current"])] == {}


def test_read_changes_model_and_bucket_pruning_semantics(spark, vtable):
    """CDF equals the model diff per commit: v2 = merge (update +
    insert + conditional delete), v3 = DV delete. Carried rows inside
    rewritten buckets must NOT appear as changes."""
    src = spark.createDataFrame(
        [
            (0, "u0", "open"),      # update
            (1, "gone", "closed"),  # matched + cond -> delete
            (500, "new", "open"),   # insert
            (501, "skip", "closed"),  # delete-marked, unmatched -> no-op
        ],
        "k long, v string, status string",
    )
    vtable.merge(src, delete_cond=F.col("s.status") == "closed")
    vtable.delete_where(F.col("k").isin(2, 3))

    changes = vtable.read_changes(1, 3).collect()
    got = {(r.k, r._change_type, r._commit_version) for r in changes}
    assert got == {
        (0, "update", 2),
        (1, "delete", 2),
        (500, "insert", 2),
        (2, "delete", 3),
        (3, "delete", 3),
    }
    by_key = {(r.k, r._commit_version): r for r in changes}
    assert by_key[(0, 2)].v == "u0"        # update: AFTER image
    assert by_key[(1, 2)].v == "v1"        # delete: BEFORE image
    assert by_key[(2, 3)].v == "v2"


def test_read_changes_replay_reconstructs_state(spark, vtable):
    """Applying the CDF on top of v1 reproduces the current table —
    the contract a downstream incremental consumer relies on."""
    vtable.merge(
        spark.createDataFrame(
            [(k, f"u{k}", "open") for k in range(0, 50)],
            "k long, v string, status string",
        )
    )
    vtable.delete_where(F.col("k") % 7 == 0)
    state = {r.k: r.v for r in vtable.read(version=1).collect()}
    for r in sorted(
        vtable.read_changes(1, vtable.manifest()["current"]).collect(),
        key=lambda r: r._commit_version,
    ):
        if r._change_type == "delete":
            state.pop(r.k)
        else:
            state[r.k] = r.v
    want = {r.k: r.v for r in vtable.read().collect()}
    assert state == want


def test_expire_snapshots_reclaims_abandoned_staging_dirs(spark, vtable):
    """A writer that died mid-staging leaves a `data/v{N}.stage-*`
    orphan; the retention sweep reclaims any stage whose version is
    ≤ current (it can never publish — ownership re-verify would
    raise), without touching live data."""
    import os

    for i in range(2):
        vtable.merge(
            spark.createDataFrame(
                [(700 + i, f"m{i}", "open")], "k long, v string, status string"
            )
        )
    stale = os.path.join(vtable.path, "data", "v2.stage-deadbeef")
    os.makedirs(stale)
    open(os.path.join(stale, "junk.parquet"), "w").close()

    out = vtable.expire_snapshots(keep_last=2)
    assert not os.path.exists(stale)
    assert out["removed_dirs"] >= 1
    assert {r.k for r in vtable.read().collect()} >= {700, 701}


def test_read_changes_empty_range_on_fully_emptied_table(spark, vtable):
    """An empty change range over a FULLY EMPTIED table must return an
    empty change frame (schema derived from a bucket-holding snapshot),
    not raise FileNotFoundError (ADVICE r05). The no-op commit is
    simulated by duplicating the emptied snapshot in the manifest —
    the writer protocol itself never produces bucket-less diffs."""
    # v2: delete every row — the snapshot holds no buckets at all
    src = spark.createDataFrame(
        [(i, f"v{i}", "closed") for i in range(200)],
        "k long, v string, status string",
    )
    vtable.merge(src, delete_cond=F.col("s.status") == "closed")
    man = vtable.manifest()
    assert man["snapshots"][str(man["current"])] == {}
    man["snapshots"]["3"] = dict(man["snapshots"]["2"])
    man["current"] = 3
    vtable._swap_manifest(man)

    out = vtable.read_changes(2, 3)
    assert out.count() == 0
    assert {"k", "v", "status", "_change_type", "_commit_version"} <= set(
        out.columns
    )


def test_expire_snapshots_keeps_reachable_dirs(spark, vtable):
    """Retention drops old snapshots and their unreferenced dirs but
    MUST keep any old version dir a kept snapshot still references
    (untouched buckets point at their original writer version)."""
    import os

    for i in range(3):
        vtable.merge(
            spark.createDataFrame(
                [(i, f"m{i}", "open")], "k long, v string, status string"
            )
        )
    assert vtable.versions() == [1, 2, 3, 4]
    out = vtable.expire_snapshots(keep_last=2)
    assert out["dropped"] == [1, 2]
    assert vtable.versions() == [3, 4]
    # v1's dir must SURVIVE: v3/v4 still map untouched buckets to it
    assert os.path.isdir(vtable._data_dir(1))
    assert vtable.read().count() == 200
    assert vtable.read(version=3).count() == 200
    with pytest.raises(FileNotFoundError):
        vtable.read(version=1)


def test_expire_snapshots_removes_unreferenced_dirs(spark, vtable):
    """A version fully superseded by later rewrites (every bucket
    rewritten since) is physically reclaimed."""
    import os

    full = spark.createDataFrame(
        [(i, "rewrite", "open") for i in range(200)],
        "k long, v string, status string",
    )
    vtable.merge(full)  # v2 rewrites EVERY bucket
    vtable.merge(
        spark.createDataFrame(
            [(0, "tail", "open")], "k long, v string, status string"
        )
    )
    out = vtable.expire_snapshots(keep_last=2)
    assert out["dropped"] == [1]
    assert not os.path.isdir(vtable._data_dir(1))  # nothing references v1
    assert vtable.read().count() == 200


# ---------------------------------------------------------------------------
# CHECK constraints (r06: Delta-style write-time validation)
# ---------------------------------------------------------------------------


def test_constraints_reject_bad_write_full_and_leave_table_absent(spark, tmp_path):
    from samza_hello_samza_spark.sources.merge import ConstraintViolation

    t = MergeTable(
        spark, str(tmp_path / "c"), "k", n_buckets=4,
        constraints={"v_nonnull": "v IS NOT NULL", "k_pos": "k >= 0"},
    )
    bad = spark.createDataFrame(
        [(1, "a"), (-2, "b"), (3, None)], "k long, v string"
    )
    with pytest.raises(ConstraintViolation) as ei:
        t.write_full(bad)
    msg = str(ei.value)
    assert "k_pos" in msg and "v_nonnull" in msg and "1 row(s)" in msg
    # nothing landed
    import os
    assert not any(e.startswith("_bucket=") for e in os.listdir(t.path)) \
        if os.path.exists(t.path) else True


def test_constraints_gate_merge_and_null_counts_as_violation(spark, tmp_path):
    from samza_hello_samza_spark.sources.merge import ConstraintViolation

    t = MergeTable(
        spark, str(tmp_path / "c2"), "k", n_buckets=4,
        constraints={"qty_pos": "qty > 0"},
    )
    t.write_full(spark.createDataFrame([(1, 5), (2, 7)], "k long, qty long"))
    ok = spark.createDataFrame([(3, 1)], "k long, qty long")
    t.merge(ok)
    assert {r.k for r in t.read().collect()} == {1, 2, 3}
    # a NULL qty is NOT true under the check → rejected (Delta strictness)
    bad = spark.createDataFrame([(4, None), (5, 0)], "k long, qty long")
    with pytest.raises(ConstraintViolation):
        t.merge(bad)
    # table unchanged by the rejected merge
    assert {r.k for r in t.read().collect()} == {1, 2, 3}


def test_constraints_versioned_rejection_leaves_no_claim_or_version(spark, tmp_path):
    from samza_hello_samza_spark.sources.merge import (
        ConstraintViolation,
        VersionedMergeTable,
    )

    t = VersionedMergeTable(
        spark, str(tmp_path / "vc"), "k", n_buckets=4,
        constraints={"status_known": "status IN ('open','closed')"},
    )
    t.write_full(
        spark.createDataFrame([(1, "open"), (2, "closed")], "k long, status string")
    )
    v1 = t.manifest()["current"]
    with pytest.raises(ConstraintViolation):
        t.merge(spark.createDataFrame([(3, "weird")], "k long, status string"))
    man = t.manifest()
    assert man["current"] == v1  # no version committed
    import os
    leftovers = [f for f in os.listdir(t.path) if f.endswith(".claim")]
    assert not leftovers, leftovers
    # a clean merge still goes through afterwards
    t.merge(spark.createDataFrame([(3, "open")], "k long, status string"))
    assert {r.k for r in t.read().collect()} == {1, 2, 3}


# ---------------------------------------------------------------------------
# partition-spec evolution (r06: rebucket as a committed version)
# ---------------------------------------------------------------------------


def _vt_rows(t, version=None):
    return {r.k: r.v for r in t.read(version=version).collect()}


def test_rebucket_preserves_rows_and_time_travel(spark, tmp_path):
    from samza_hello_samza_spark.sources.merge import VersionedMergeTable

    t = VersionedMergeTable(spark, str(tmp_path / "rb"), "k", n_buckets=4)
    t.write_full(
        spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k long, v string")
    )
    before = _vt_rows(t)
    stats = t.rebucket(16)
    assert stats["rewritten"] and stats["n_buckets"] == 16
    assert _vt_rows(t) == before                     # same table
    assert _vt_rows(t, version=1) == before          # time travel intact
    # physical layout actually changed spec
    import os
    v2 = os.path.join(t.path, "data", "v2")
    n_dirs = sum(1 for e in os.listdir(v2) if e.startswith("_bucket="))
    assert 4 < n_dirs <= 16
    # no-op when the spec already matches
    again = t.rebucket(16)
    assert again == {"version": 2, "n_buckets": 16, "rewritten": False}


def test_merges_after_rebucket_route_by_new_spec(spark, tmp_path):
    from samza_hello_samza_spark.sources.merge import VersionedMergeTable

    t = VersionedMergeTable(spark, str(tmp_path / "rb2"), "k", n_buckets=2)
    t.write_full(
        spark.createDataFrame([(i, f"v{i}") for i in range(50)], "k long, v string")
    )
    t.rebucket(8)
    # a handle constructed with the STALE bucket count must still
    # route correctly — the spec comes from the manifest, not __init__
    from samza_hello_samza_spark.sources.merge import VersionedMergeTable as VT

    stale = VT(spark, t.path, "k", n_buckets=2)
    stale.merge(
        spark.createDataFrame([(7, "NEW7"), (999, "ins")], "k long, v string")
    )
    got = _vt_rows(stale)
    assert got[7] == "NEW7" and got[999] == "ins" and len(got) == 51
    # lookups across the whole keyspace still see every row
    assert {r.k for r in stale.read().collect()} == set(range(50)) | {999}


def test_rebucket_nets_zero_cdf_changes_and_materializes_dvs(spark, tmp_path):
    from samza_hello_samza_spark.sources.merge import VersionedMergeTable
    from pyspark.sql import functions as F

    t = VersionedMergeTable(spark, str(tmp_path / "rb3"), "k", n_buckets=4)
    t.write_full(
        spark.createDataFrame([(i, f"v{i}") for i in range(60)], "k long, v string")
    )
    t.delete_where(F.col("k") < 10)          # v2: DVs over v1 files
    assert set(_vt_rows(t)) == set(range(10, 60))
    t.rebucket(9)                             # v3: rewrite under new spec
    assert set(_vt_rows(t)) == set(range(10, 60))
    # deleted keys stay deleted and DVs were materialized by the rewrite
    man = t.manifest()
    assert man["deletes"]["3"] == {}
    # the rebucket commit itself is change-free in the CDF
    ch = t.read_changes(2, 3)
    assert ch.count() == 0
    # while the delete commit still reports its deletes
    ch12 = t.read_changes(1, 2)
    assert ch12.filter(F.col("_change_type") == "delete").count() == 10


def test_history_ledger_records_every_operation(spark, vtable):
    """DESCRIBE HISTORY: one row per version, operation names and
    audited counts match what each commit actually did, and a version
    committed by a pre-ops writer degrades to UNKNOWN, not a crash."""
    src = spark.createDataFrame(
        [(i, f"N{i}", "open") for i in range(30)]      # 30 updates
        + [(i, f"v{i}", "closed") for i in range(100, 105)]  # 5 deletes
        + [(i, f"i{i}", "open") for i in range(500, 510)],   # 10 inserts
        "k long, v string, status string",
    )
    vtable.merge(src, delete_cond=F.col("s.status") == "closed")
    vtable.delete_where(F.col("k") % 50 == 1)
    vtable.compact_deletes()
    vtable.rebucket(4)
    hist = {r.version: r for r in vtable.history().collect()}
    assert [hist[v].operation for v in sorted(hist)] == [
        "WRITE", "MERGE", "DELETE", "COMPACT", "REBUCKET"
    ]
    assert (hist[1].inserted, hist[1].updated, hist[1].deleted) == (200, 0, 0)
    assert (hist[2].inserted, hist[2].updated, hist[2].deleted) == (10, 30, 5)
    # post-v2 keys ≡1 (mod 50): from 0..199 minus deleted 100-104,
    # plus inserts 500-519 → recompute from the actual v2 state
    expect_del = vtable.read(version=2).filter(F.col("k") % 50 == 1).count()
    assert (hist[3].inserted, hist[3].updated, hist[3].deleted) == (0, 0, expect_del)
    assert hist[4].operation == "COMPACT" and hist[5].operation == "REBUCKET"
    # UNKNOWN fallback: drop one ops entry as a pre-ops manifest would
    man = vtable.manifest()
    del man["ops"]["2"]
    vtable._swap_manifest(man)
    assert {r.version: r.operation for r in vtable.history().collect()}[2] == "UNKNOWN"


def _file_stats(df, col):
    """(file, min, max) per physical parquet file of a read."""
    return (
        df.groupBy(F.input_file_name().alias("f"))
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )


def test_optimize_zorder_preserves_rows_and_tightens_stats(spark, tmp_path):
    """OPTIMIZE ZORDER is layout motion only: identical row set, zero
    net CDF, OPTIMIZE in the history ledger — and the per-file min/max
    stats on BOTH clustered columns tighten enough that a narrow box
    probe overlaps at most half the file fraction it did before."""
    t = VersionedMergeTable(spark, str(tmp_path / "z"), "k", n_buckets=4)
    base = spark.range(4000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 1000).alias("a"),
        ((F.col("id") * 91) % 1000).alias("b"),
    )
    t.write_full(base)

    def overlap_fraction(stats, lo, hi):
        return sum(1 for r in stats if r.lo <= hi and r.hi >= lo) / len(stats)

    before = overlap_fraction(_file_stats(t.read(), "a"), 100, 120)
    res = t.optimize_zorder("a", "b", bits=6, files_per_bucket=8)
    assert res["rewritten"] and res["version"] == 2

    got = {(r.k, r.a, r.b) for r in t.read().collect()}
    want = {(r.k, r.a, r.b) for r in base.collect()}
    assert got == want
    assert t.read_changes(1, 2).count() == 0  # pure layout motion
    hist = {r.version: r.operation for r in t.history().collect()}
    assert hist[2] == "OPTIMIZE"

    stats_after = _file_stats(t.read(), "a")
    assert len(stats_after) > len(_file_stats(t.read(version=1), "a"))
    after = overlap_fraction(stats_after, 100, 120)
    assert after <= 0.5 * before, (before, after)

    # the table stays a normal merge target afterwards
    src = spark.createDataFrame([(1, 5, 5), (9999, 1, 1)], "k long, a long, b long")
    stats = t.merge(src)
    assert (stats["inserted"], stats["updated"]) == (1, 1)
    assert t.read().filter("k = 9999").count() == 1


def test_merge_txn_watermark_exactly_once(spark, vtable):
    """txn=(app_id, version) makes MERGE idempotent per app: a replay
    at or below the recorded watermark writes NOTHING (no new version,
    table byte-identical), higher versions apply, and watermarks are
    per-app."""
    src = spark.createDataFrame(
        [(0, "T0", "open"), (900, "new", "open")], "k long, v string, status string"
    )
    r1 = vtable.merge(src, txn=("app", 0))
    assert r1["applied"] and r1["version"] == 2
    assert vtable.manifest()["txn"] == {"app": 0}
    state = {(r.k, r.v) for r in vtable.read().collect()}

    # replay (same txn version, even with DIFFERENT rows) is refused
    replay = spark.createDataFrame(
        [(0, "EVIL", "open")], "k long, v string, status string"
    )
    r2 = vtable.merge(replay, txn=("app", 0))
    assert not r2["applied"] and r2["version"] == 2
    assert {(r.k, r.v) for r in vtable.read().collect()} == state
    assert vtable.manifest()["current"] == 2

    # the next batch applies; an unrelated app has its own watermark
    r3 = vtable.merge(
        spark.createDataFrame([(901, "b1", "open")], "k long, v string, status string"),
        txn=("app", 1),
    )
    assert r3["applied"] and vtable.manifest()["txn"]["app"] == 1
    r4 = vtable.merge(
        spark.createDataFrame([(902, "o0", "open")], "k long, v string, status string"),
        txn=("other", 0),
    )
    assert r4["applied"] and vtable.manifest()["txn"] == {"app": 1, "other": 0}


def test_versioned_merge_sink_refuses_full_redelivery(spark, tmp_path):
    """The streaming exactly-once sink: a run folds each micro-batch
    once; restarting the SAME app over a fresh checkpoint (total
    redelivery from the source) changes nothing — the table's txn
    watermark, not a marker file, refuses every replayed batch."""
    from samza_hello_samza_spark.streaming.maintenance import versioned_merge_sink

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i in range(3):
        spark.createDataFrame(
            [(j, f"f{i}", 0) for j in range(i * 10, i * 10 + 10)],
            "k long, v string, del int",
        ).coalesce(1).write.parquet(str(src_dir / f"batch{i}"))

    t = VersionedMergeTable(spark, str(tmp_path / "vt2"), "k", n_buckets=4)
    t.write_full(
        spark.createDataFrame([(999, "seed", 0)], "k long, v string, del int")
    )

    def run(ckpt):
        stream = (
            spark.readStream.schema("k long, v string, del int")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir) + "/*")
        )
        q = versioned_merge_sink(
            stream, t, str(tmp_path / ckpt), app_id="loader", delete_col="del"
        )
        q.processAllAvailable()
        q.stop()

    run("ckpt1")
    state = {(r.k, r.v) for r in t.read().collect()}
    assert len(state) == 31  # 30 streamed + seed
    version = t.manifest()["current"]
    wm = t.manifest()["txn"]["loader"]

    run("ckpt2")  # fresh checkpoint: batches 0.. redeliver from scratch
    assert {(r.k, r.v) for r in t.read().collect()} == state
    assert t.manifest()["current"] == version
    assert t.manifest()["txn"]["loader"] == wm


def test_clone_is_zero_copy_and_independent(spark, vtable):
    """CLONE: the clone reads every version the source had, commits on
    either side diverge independently, txn watermarks do not carry
    over, and expiring the source's old snapshots does not break the
    clone (hardlinks keep the bytes alive)."""
    src = spark.createDataFrame(
        [(i, f"N{i}", "open") for i in range(20)], "k long, v string, status string"
    )
    import os

    vtable.merge(src, txn=("loader", 5))
    base = os.path.dirname(vtable.path)
    clone = vtable.clone_to(os.path.join(base, "vt_clone"))

    for ver in (1, 2):
        a = {(r.k, r.v) for r in vtable.read(version=ver).collect()}
        b = {(r.k, r.v) for r in clone.read(version=ver).collect()}
        assert a == b and len(a) > 0
    assert "txn" not in clone.manifest()  # a clone is a new table

    # divergence: a commit on the clone is invisible to the source
    clone.merge(
        spark.createDataFrame([(777, "c", "open")], "k long, v string, status string")
    )
    assert clone.read().filter("k = 777").count() == 1
    assert vtable.read().filter("k = 777").count() == 0
    assert vtable.manifest()["current"] == 2 and clone.manifest()["current"] == 3

    # and vice versa
    vtable.merge(
        spark.createDataFrame([(888, "s", "open")], "k long, v string, status string")
    )
    assert clone.read().filter("k = 888").count() == 0

    # source retention cannot strand the clone: hardlinked bytes live
    vtable.expire_snapshots(keep_last=1)
    assert {r.k for r in clone.read(version=1).collect()} == set(range(200))

    # refuse to overwrite an existing table
    with pytest.raises(FileExistsError):
        vtable.clone_to(clone.path)


# -- named refs: tags + branches --------------------------------------------


def _rows(df):
    return sorted((r.k, r.v, r.status) for r in df.collect())


def test_tag_pins_snapshot_through_expiry(spark, vtable):
    """A tagged version stays readable (by tag AND by number) after a
    retention sweep that drops every other historical version — the
    Iceberg ref contract ("the corpus we trained on" survives)."""
    vtable.merge(
        spark.createDataFrame([(1, "T2", "open")], "k long, v string, status string")
    )  # v2
    want = _rows(vtable.read())
    tag_commit = vtable.create_tag("train-v1")  # pins v2, commits v3
    assert tag_commit == 3 and vtable.tags() == {"train-v1": 2}
    # the CREATE TAG commit is in the ledger (history is itself
    # retention-scoped, so check before the sweep below)
    ops = {r.version: r.operation for r in vtable.history().collect()}
    assert ops[3] == "CREATE TAG train-v1"
    for i in range(3):  # v4..v6 rewrite every tagged bucket's entry
        vtable.merge(
            spark.createDataFrame(
                [(k, f"R{i}", "open") for k in range(200)],
                "k long, v string, status string",
            )
        )
    dropped = vtable.expire_snapshots(keep_last=1)["dropped"]
    assert 2 not in dropped and 1 in dropped
    assert _rows(vtable.read(tag="train-v1")) == want
    assert _rows(vtable.read(version=2)) == want


def test_tag_commit_is_metadata_only(spark, vtable):
    """CREATE TAG commits a version but writes no data dir, carries
    the snapshot forward verbatim, and nets zero CDF changes."""
    import os

    before = _rows(vtable.read())
    v = vtable.create_tag("t0", version=1)  # v2
    assert not os.path.isdir(vtable._data_dir(v))
    man = vtable.manifest()
    assert man["snapshots"]["2"] == man["snapshots"]["1"]
    assert _rows(vtable.read()) == before
    net = vtable.read_changes(1, 2)
    assert net.count() == 0


def test_tag_ops_validate_before_claim(spark, vtable):
    """A rejected tag op leaves NO claim file and NO version behind
    (same contract as constraint-rejected writes)."""
    import os

    with pytest.raises(FileNotFoundError):
        vtable.create_tag("ghost", version=99)
    vtable.create_tag("once")  # v2
    with pytest.raises(FileExistsError):
        vtable.create_tag("once")
    with pytest.raises(KeyError):
        vtable.delete_tag("never-made")
    with pytest.raises(ValueError):
        vtable.read(version=1, tag="once")
    assert vtable.manifest()["current"] == 2
    assert not os.path.exists(os.path.join(vtable.path, "v3.claim"))


def test_delete_tag_releases_retention_pin(spark, vtable):
    """After DROP TAG the previously-pinned version expires normally
    and the tag name no longer resolves."""
    vtable.create_tag("tmp", version=1)  # v2
    vtable.merge(
        spark.createDataFrame(
            [(k, "X", "open") for k in range(200)],
            "k long, v string, status string",
        )
    )  # v3
    vtable.delete_tag("tmp")  # v4
    dropped = vtable.expire_snapshots(keep_last=1)["dropped"]
    assert 1 in dropped and vtable.tags() == {}
    with pytest.raises(KeyError):
        vtable.read(tag="tmp")


def test_branch_diverges_and_survives_source_expiry(spark, vtable):
    """Branches are zero-copy forks: commits on either side are
    invisible to the other, the source's retention sweep cannot break
    the branch's reads, and the WAP loop (branch → validate → merge
    back) lands the branch's state on main."""
    main_before = _rows(vtable.read())
    br = vtable.create_branch("wap")
    assert vtable.branches() == ["wap"]
    # write on the branch only
    br.merge(
        spark.createDataFrame(
            [(999, "BR", "open")], "k long, v string, status string"
        )
    )
    assert _rows(vtable.read()) == main_before
    assert (999, "BR", "open") in _rows(br.read())
    # write on main only; branch (re-opened by name) does not see it
    vtable.merge(
        spark.createDataFrame(
            [(k, "M", "open") for k in range(200)],
            "k long, v string, status string",
        )
    )
    br2 = vtable.branch("wap")
    assert (0, "M", "open") not in _rows(br2.read())
    # expire main hard; branch reads stay intact (hardlinked files)
    vtable.expire_snapshots(keep_last=1)
    assert (999, "BR", "open") in _rows(br2.read())
    # publish: merge the audited branch state back onto main
    vtable.merge(br2.read())
    assert (999, "BR", "open") in _rows(vtable.read())
    with pytest.raises(KeyError):
        vtable.branch("nope")


# -- incremental JOIN-view maintenance (orders_cdf_join_mv) ----------------


def test_join_mv_incremental_equals_recompute(spark):
    """The IVM invariant: the change-batch-maintained enriched view
    equals a from-scratch recompute of (final state ⋈ customer)."""
    from samza_hello_samza_spark.sources.merge import (
        _cdf_orders_table,
        orders_cdf_join_mv,
    )
    from tests.conftest import SF_DIR as _SF

    got = sorted(
        tuple(r)
        for r in orders_cdf_join_mv(spark, _SF)
        .select("o_custkey", "last_orderkey", "last_status", "c_mktsegment")
        .collect()
    )
    from samza_hello_samza_spark.session import load_table

    base = _cdf_orders_table(spark, _SF)
    cust = load_table(spark, _SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    want = sorted(
        tuple(r)
        for r in base.read()
        .join(cust, "o_custkey")
        .select("o_custkey", "last_orderkey", "last_status", "c_mktsegment")
        .collect()
    )
    assert got == want and got


def test_join_mv_rerun_is_a_noop(spark):
    """Marker + txn watermarks make a re-entrant run fold nothing: the
    MV table's version ledger must not grow on a second call."""
    import os as _os

    from samza_hello_samza_spark.operators.ann_index import _index_root, _tag
    from samza_hello_samza_spark.sources.merge import (
        VersionedMergeTable,
        orders_cdf_join_mv,
    )
    from tests.conftest import SF_DIR as _SF

    first = sorted(tuple(r) for r in orders_cdf_join_mv(spark, _SF).collect())
    mv = VersionedMergeTable(
        spark,
        _os.path.join(_index_root(), _tag(_SF), "cdf_join_mv", "mv"),
        "o_custkey",
        n_buckets=16,
    )
    v_before = mv.versions()
    again = sorted(tuple(r) for r in orders_cdf_join_mv(spark, _SF).collect())
    assert again == first
    assert mv.versions() == v_before


def test_orders_time_travel_oracle_and_isolation(spark, duck):
    """read(version=2) hash-matches the first-principles v2 replay,
    and is UNAFFECTED by the v3 delete that follows it (snapshot
    isolation through the commit log)."""
    from samza_hello_samza_spark.sources.merge import ORACLES as M_ORACLES
    from samza_hello_samza_spark.sources.merge import (
        _cdf_orders_table,
        orders_time_travel,
    )
    from tests.conftest import SF_DIR as _SF
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        spark, duck, orders_time_travel, M_ORACLES["orders_time_travel"]
    )
    v2 = {r.o_custkey for r in orders_time_travel(spark, _SF).collect()}
    v3 = {r.o_custkey for r in _cdf_orders_table(spark, _SF).read().collect()}
    assert v3 < v2  # the later delete removed keys v2 still holds


def test_restore_rolls_back_as_a_new_commit(spark, vtable):
    """RESTORE: the restored read equals the target version exactly,
    history is appended (never rewritten — the in-between version
    stays time-travelable), the ops ledger records the RESTORE, the
    change feed across the restore commit is exactly the rows the
    rollback un-does, and retention after the restore cannot reclaim
    the restored data."""
    v1 = {r.k: (r.v, r.status) for r in vtable.read().collect()}
    vtable.merge(
        spark.createDataFrame(
            [(0, "CHANGED", "open"), (9000, "NEWROW", "open")],
            "k long, v string, status string",
        )
    )
    vtable.delete_where(F.col("k") == 5)
    assert vtable.manifest()["current"] == 3

    new_v = vtable.restore(1)
    assert new_v == 4
    got = {r.k: (r.v, r.status) for r in vtable.read().collect()}
    assert got == v1  # exactly the v1 state again

    # history appended, not rewritten: v3 still shows the delete
    v3 = {r.k for r in vtable.read(version=3).collect()}
    assert 5 not in v3 and 9000 in v3
    ops = {r.version: r.operation for r in vtable.history().collect()}
    assert ops[4] == "RESTORE v1"

    # CDF across the restore = the rows the rollback un-does
    ch = vtable.read_changes(3, 4).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, set()).add(r.k)
    assert by_type.get("insert") == {5}  # the deleted row comes back
    assert by_type.get("delete") == {9000}  # the merged-in row leaves
    assert by_type.get("update") == {0}  # the changed row reverts

    # zero-copy + retention safety: expire everything but the restore,
    # the restored state must stay byte-readable
    vtable.expire_snapshots(keep_last=1)
    assert {
        r.k: (r.v, r.status) for r in vtable.read().collect()
    } == v1

    # guards: unknown + already-current targets fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already the current"):
        vtable.restore(4)
    with _pytest.raises(FileNotFoundError, match="no such snapshot"):
        vtable.restore(99)


def test_restore_loses_claim_race_cleanly(spark, vtable):
    """RESTORE goes through the same O_EXCL claim as data writes: if a
    concurrent writer already claimed the next version, the restore
    raises having changed nothing — it can never fork the log."""
    import os
    vtable.merge(
        spark.createDataFrame([(1, "Z", "open")], "k long, v string, status string")
    )
    cur = vtable.manifest()["current"]
    # simulate a concurrent writer holding the next version's claim
    claim = os.path.join(vtable.path, f"v{cur + 1}.claim")
    with open(claim, "w") as f:
        f.write("someone-else")
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="claimed"):
            vtable.restore(1)
        assert vtable.manifest()["current"] == cur  # nothing committed
    finally:
        os.remove(claim)
    # with the claim gone the same restore succeeds
    assert vtable.restore(1) == cur + 1


# -- RESTORE through the CDC consumer chain (orders_restore_audit) ---------


def test_orders_restore_audit_matches_oracle_and_is_idempotent(spark, duck):
    """r08: the registered restore-through-consumer drill — the MV
    maintained across v2 MERGE + v3 delete + v4 RESTORE(1) equals the
    v1 snapshot ⋈ customer (DuckDB first-principles replay), and a
    re-entrant run neither drains nor commits anything (cursor +
    offsets + txn watermarks)."""
    import os as _os

    from samza_hello_samza_spark.operators.ann_index import _index_root, _tag
    from samza_hello_samza_spark.sources.merge import (
        ORACLES,
        QUERIES,
        VersionedMergeTable,
        orders_restore_audit,
    )
    from tests.conftest import SF_DIR as _SF
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        spark, duck, QUERIES["orders_restore_audit"], ORACLES["orders_restore_audit"]
    )
    mv = VersionedMergeTable(
        spark,
        _os.path.join(_index_root(), _tag(_SF), "restore_join_mv", "mv"),
        "o_custkey",
        n_buckets=16,
    )
    v_before = mv.versions()
    first = sorted(tuple(r) for r in orders_restore_audit(spark, _SF).collect())
    assert mv.versions() == v_before  # re-entrant run committed nothing
    assert first  # non-degenerate

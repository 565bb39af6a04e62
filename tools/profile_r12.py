#!/usr/bin/env python3
"""Per-key job-level profiler for the r12 optimization round.

Same event-log methodology as tools/profile_r11.py, plus an
``--sf1`` flag that builds (or reuses) the 10x-replicated tier via
tools/scale_probe.build_scaled and warms the cold layout builds the
bench warms, so the profiled pass is the bench's warm pass.

Usage: profile_r12.py [--sf SF_DIR | --sf1] [--passes N] [KEY ...]
Writes a JSON report to /tmp/profile_r12.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

EVENT_DIR = "/tmp/spark-events-r12"

DEFAULT_KEYS = (
    "ann_filtered_sq8_topk",
    "ann_mrl_indexed_topk",
    "ann_sq8_indexed_topk",
)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    sf1 = False
    passes = 2
    while argv and argv[0].startswith("--"):
        if argv[0] == "--sf":
            sf_dir = argv[1]
            argv = argv[2:]
        elif argv[0] == "--sf1":
            sf1 = True
            argv = argv[1:]
        elif argv[0] == "--passes":
            passes = int(argv[1])
            argv = argv[2:]
        else:
            raise SystemExit(f"unknown flag {argv[0]}")
    keys = tuple(argv) or DEFAULT_KEYS

    os.makedirs(EVENT_DIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    from pyspark.sql import SparkSession

    from samza_hello_samza_spark.registry import all_queries
    from samza_hello_samza_spark import session as sess

    def get_spark_logged(app_name="profile", cpus=None):
        cpus = cpus or sess.default_cpus()
        b = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
        b = (
            b.config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", EVENT_DIR)
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
        return b.getOrCreate()

    sess.get_spark = get_spark_logged
    spark = get_spark_logged("profile-r12")
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    queries = all_queries()

    if sf1:
        from scale_probe import build_scaled

        sf_dir = build_scaled(spark, 10)

    # warmup (bench.py's discipline: JVM + layout builds uncounted).
    # Cold-build warmups mirror bench.py's sf1 warm list for any key
    # being profiled whose layout build would otherwise ride pass 1.
    for w in ("groupby_count", "ann_lsh_topk", "ann_pq_topk", "mv_event_type_stats"):
        queries[w](spark, sf_dir).write.mode("overwrite").format("noop").save()
    for k in keys:
        if k in queries:
            queries[k](spark, sf_dir).write.mode("overwrite").format("noop").save()

    marks: dict[str, list[float]] = {}
    for p in range(passes):
        for k in keys:
            fn = queries.get(k)
            if fn is None:
                continue
            sc = spark.sparkContext
            for rdd in sc._jsc.getPersistentRDDs().values():
                rdd.unpersist(True)
            spark.catalog.clearCache()
            sc.setJobGroup(f"{k}#p{p}", k)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            marks.setdefault(k, []).append(round(dt, 3))
            print(f"timed {k} pass{p}: {dt:.3f}s", file=sys.stderr)

    spark.stop()
    time.sleep(2)

    log_path = os.path.join(EVENT_DIR, app_id)
    if not os.path.exists(log_path):
        cands = [
            p
            for p in os.listdir(EVENT_DIR)
            if p.startswith(app_id) or p.endswith(app_id)
        ]
        if cands:
            log_path = os.path.join(EVENT_DIR, cands[0])
    if os.path.isdir(log_path):
        parts = sorted(
            os.path.join(log_path, p)
            for p in os.listdir(log_path)
            if p.startswith("events_")
        )
        merged = log_path + ".merged.jsonl"
        with open(merged, "w") as out:
            for part in parts:
                with open(part) as fh:
                    out.write(fh.read())
        log_path = merged
    jobs = {}
    stages = {}
    with open(log_path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jid = ev["Job ID"]
                jobs[jid] = {
                    "group": props.get("spark.jobGroup.id"),
                    "start": ev.get("Submission Time"),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "desc": (props.get("spark.job.description") or "")[:70],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev.get("Completion Time")
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                subm, comp = si.get("Submission Time"), si.get("Completion Time")
                inp = sr = sw = 0
                for acc in si.get("Accumulables", []):
                    if acc.get("Name") == "internal.metrics.input.bytesRead":
                        inp = acc.get("Value", 0)
                    elif acc.get("Name") == "internal.metrics.shuffle.read.remoteBytesRead":
                        sr += acc.get("Value", 0)
                    elif acc.get("Name") == "internal.metrics.shuffle.read.localBytesRead":
                        sr += acc.get("Value", 0)
                    elif acc.get("Name") == "internal.metrics.shuffle.write.bytesWritten":
                        sw = acc.get("Value", 0)
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", "")[:70],
                    "dur_ms": (comp - subm) if (subm and comp) else 0,
                    "n_tasks": si.get("Number of Tasks"),
                    "input_mb": round(inp / 1e6, 1),
                    "shuf_r_mb": round(sr / 1e6, 1),
                    "shuf_w_mb": round(sw / 1e6, 1),
                }

    report = {}
    for k in keys:
        per_pass = {}
        for p in range(passes):
            grp = f"{k}#p{p}"
            kj = [j for j in jobs.values() if j.get("group") == grp and "end" in j]
            rows = []
            for j in sorted(kj, key=lambda x: x["start"]):
                jdur = (j["end"] - j["start"]) / 1000.0
                sinfo = sorted(
                    (stages[s] for s in j["stages"] if s in stages),
                    key=lambda s: -s["dur_ms"],
                )
                top = sinfo[0] if sinfo else {}
                rows.append(
                    {
                        "dur_s": round(jdur, 3),
                        "n_stages_run": len(sinfo),
                        "top_stage": top,
                        "desc": j["desc"],
                    }
                )
            walls = marks.get(k, [])
            wall = walls[p] if p < len(walls) else None
            per_pass[f"pass{p}"] = {
                "wall_s": wall,
                "n_jobs": len(rows),
                "driver_gap_s": (
                    round(wall - sum(r["dur_s"] for r in rows), 3)
                    if wall is not None
                    else None
                ),
                "jobs": rows,
            }
        report[k] = per_pass

    with open("/tmp/profile_r12.json", "w") as fh:
        json.dump(report, fh, indent=1)

    print(f"\n{'key':<42}{'pass':>5}{'wall':>8}{'jobs':>6}{'gap':>8}")
    for k, pp in report.items():
        for p, r in pp.items():
            print(f"{k:<42}{p:>5}{r['wall_s']:>8}{r['n_jobs']:>6}{r['driver_gap_s']:>8}")
    print("\nfull report: /tmp/profile_r12.json")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-key job-level profiler for the r11 optimization round.

For each named key (default: the round's heavy hitters), runs the
query through the noop sink inside its own job group with the Spark
event log on, then parses the log to report per key:

- wall seconds (same methodology as bench.py's timed region),
- number of Spark jobs (driver round-trips inside the timed region),
- per-job duration and the job's slowest stage (name, task time,
  shuffle read/write bytes) so "round-trip-bound vs stage-bound" is
  one read, not a guess.

Usage: profile_r11.py [--sf SF_DIR] [KEY ...]
Writes a JSON report to /tmp/profile_r11.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

EVENT_DIR = "/tmp/spark-events-r11"

DEFAULT_KEYS = (
    "dedup_lsh_eval",
    "hybrid_batch_indexed",
    "bm25_batch_wand",
    "dedup_prefix_filter",
    "lsh_band_sweep",
    "dedup_simhash",
    "minhash_jaccard_estimate",
    "ann_sq8_batch_wide",
    "hybrid_search_indexed",
    "ann_sq8_rerank_topk",
    "hybrid_filtered_indexed",
    "bm25_batch_wide",
    "bm25_search_wand",
    "ann_sq8_topk",
    "dedup_window_incremental",
    "dsir_importance",
    "wikipedia_stats",
    "bm25_batch_indexed",
    "ann_sq8_batch_topk",
    "sequence_packing_curriculum_materialize",
    "customer_pareto_curve",
    "doc_pagerank",
    "dedup_minhash_lsh",
    "wand_tier_sweep_workload",
    "basket_pmi",
    "basket_rules",
    "contamination_bloom",
    "text_contamination",
    "session_order_overlap",
    "data_quality_report",
    "dedup_lsh_eval_stratum",
)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if argv and argv[0] == "--sf":
        sf_dir = argv[1]
        argv = argv[2:]
    keys = tuple(argv) or DEFAULT_KEYS

    os.makedirs(EVENT_DIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    from pyspark.sql import SparkSession

    from samza_hello_samza_spark.registry import all_queries
    from samza_hello_samza_spark import session as sess

    # same factory as bench.py plus the event log
    builder_orig = sess.get_spark

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

    sess.get_spark = get_spark_logged  # any operator re-entering the factory
    spark = get_spark_logged("profile-r11")
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    queries = all_queries()

    # warmup (bench.py's discipline: JVM + layout builds uncounted)
    for w in (
        "groupby_count",
        "ann_lsh_topk",
        "ann_pq_topk",
        "mv_event_type_stats",
    ):
        queries[w](spark, sf_dir).write.mode("overwrite").format("noop").save()

    marks = {}
    for k in keys:
        fn = queries.get(k)
        if fn is None:
            print(f"skip {k}: not registered", file=sys.stderr)
            continue
        sc = spark.sparkContext
        # bench.py's r11 measurement-hygiene discipline: release dead
        # checkpoint blocks BETWEEN keys (blocking), outside the timed
        # region, so late keys aren't inflated by block buildup.
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
        sc.setJobGroup(k, k)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        marks[k] = round(dt, 3)
        print(f"timed {k}: {dt:.3f}s", file=sys.stderr)

    spark.stop()
    time.sleep(2)

    # ---- parse the event log ----
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
        # rolling event log (eventlog_v2_<app>): concatenate the parts
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
    jobs = {}  # job_id -> dict
    stages = {}  # stage_id -> dict
    job_of_stage = {}
    with open(log_path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                grp = props.get("spark.jobGroup.id")
                jid = ev["Job ID"]
                jobs[jid] = {
                    "group": grp,
                    "start": ev.get("Submission Time"),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "desc": (props.get("spark.job.description") or "")[:60],
                }
                for s in jobs[jid]["stages"]:
                    job_of_stage[s] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev.get("Completion Time")
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                subm, comp = si.get("Submission Time"), si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:70],
                    "dur_ms": (comp - subm) if (subm and comp) else 0,
                    "n_tasks": si.get("Number of Tasks"),
                }

    report = {}
    for k in keys:
        kj = [j for j in jobs.values() if j.get("group") == k and "end" in j]
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
                    "top_stage_ms": top.get("dur_ms"),
                    "top_stage": top.get("name"),
                    "desc": j["desc"],
                }
            )
        gap = round(marks.get(k, 0) - sum(r["dur_s"] for r in rows), 3)
        report[k] = {
            "wall_s": marks.get(k),
            "n_jobs": len(rows),
            "driver_gap_s": gap,  # wall minus in-job time: planning/collect overhead
            "jobs": rows,
        }

    with open("/tmp/profile_r11.json", "w") as fh:
        json.dump(report, fh, indent=1)

    print(f"\n{'key':<42}{'wall':>8}{'jobs':>6}{'gap':>8}")
    for k, r in sorted(report.items(), key=lambda kv: -(kv[1]["wall_s"] or 0)):
        print(f"{k:<42}{r['wall_s']:>8}{r['n_jobs']:>6}{r['driver_gap_s']:>8}")
    print("\nfull report: /tmp/profile_r11.json")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""r11 adjudication re-times (VERDICT r10 "what's wrong" #1 and #2).

Isolated warm-JVM solo re-time, per the r10 methodology note in
BASELINE.md: warm the JVM with ~20 varied plans first, read the
groupby_count canary against its full-run value, THEN time the
suspect keys — a fresh-JVM solo run overstates small keys 2-3×
uniformly and proves nothing.

Suspects (both sf1 tier):
- bm25_batch_wide: committed BENCH_LOCAL_r10 read 14.273 s = 2.16× of
  its 6.601 freeze (driver run same round: 8.154 = 1.24×; plan
  untouched since r09) — the round's one WEAK row.
- dedup_window_exact: 2.956 in the committed r10 run vs 1.695 in
  r09's (1.74×), drifting two rounds; its sf1 freeze is 2.006.

Run SOLO (no concurrent Spark work). Prints three passes per key and
a verdict line each; numbers go to BASELINE.md + BASELINE.json if a
re-freeze is warranted.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

from samza_hello_samza_spark.registry import all_queries  # noqa: E402
from samza_hello_samza_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

#: varied warmup plans (scan/shuffle/window/join/text/ANN shapes) —
#: the state a full bench run reaches before the sf1 tier.
WARMUP = (
    "groupby_count", "q1_pricing_summary", "q3_shipping_priority",
    "q6_forecast_revenue", "part_type_stats", "tumbling_window",
    "session_window", "stream_stream_join", "stream_table_join",
    "wordcount", "dedup_exact", "dedup_chunk_exact", "text_quality",
    "events_funnel", "cohort_retention", "corpus_profile",
    "perplexity_proxy", "top_events_per_user", "events_time_rollup",
    "user_event_entropy",
)

SUSPECTS = ("bm25_batch_wide", "dedup_window_exact")
#: full-run sf1 canary value from BENCH_LOCAL_r10 (groupby_count).
CANARY_FULLRUN = 0.2
FREEZES = {"bm25_batch_wide": 6.601, "dedup_window_exact": 2.006}


def main() -> None:
    spark = get_spark("retime-r11")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)

    def run(name: str, d: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, d).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    print(f"[retime] warmup: {len(WARMUP)} varied plans at sf0.1")
    for name in WARMUP:
        run(name, sf_dir)

    # first-bench freeze for the r11 key (sf0.1 tier): layout builds
    # are the uncounted warmup call, then three timed passes.
    run("hybrid_filtered_indexed", sf_dir)
    spark._jvm.System.gc()
    c01 = min(run("groupby_count", sf_dir) for _ in range(2))
    print(f"[retime] canary groupby_count sf0.1 {c01:.3f}")
    passes = [run("hybrid_filtered_indexed", sf_dir) for _ in range(3)]
    print(
        "[freeze] hybrid_filtered_indexed sf0.1 passes "
        + "/".join(f"{p:.3f}" for p in passes)
        + f" -> min {min(passes):.3f}"
    )

    from scale_probe import build_scaled

    sf1_dir = build_scaled(spark, 10)
    print(f"[retime] sf1 dir {sf1_dir}")
    # layout warmups the bench also does before the sf1 tier (the
    # suspects' own layouts): BM25 posting layout for the wide batch,
    # and the r11 key's label-attr BM25 + SQ8 layouts.
    run("bm25_search_indexed", sf1_dir)
    run("hybrid_filtered_indexed", sf1_dir)

    spark._jvm.System.gc()
    canary = min(run("groupby_count", sf1_dir) for _ in range(2))
    print(
        f"[retime] canary groupby_count sf1 {canary:.3f} "
        f"(full-run value ~{CANARY_FULLRUN}; >2x means ambient, abort)"
    )
    load1 = os.getloadavg()[0]
    print(f"[retime] 1-min load {load1:.2f} / {os.cpu_count()} cpus")

    for name in SUSPECTS:
        passes = [run(name, sf1_dir) for _ in range(3)]
        best = min(passes)
        fr = FREEZES[name]
        print(
            f"[retime] {name} sf1 passes "
            + "/".join(f"{p:.3f}" for p in passes)
            + f" -> min {best:.3f} = {best / fr:.2f}x of freeze {fr}"
        )

    passes = [run("hybrid_filtered_indexed", sf1_dir) for _ in range(3)]
    print(
        "[freeze] hybrid_filtered_indexed sf1 passes "
        + "/".join(f"{p:.3f}" for p in passes)
        + f" -> min {min(passes):.3f}"
    )

    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""r11 second-wave solo freezes: ann_sq8_batch_wide and
wand_tier_sweep_workload at both tiers, per the warm-JVM methodology
note in BASELINE.md (varied warmup plans + canary read first; layout
builds are uncounted warmup). Run SOLO."""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

from samza_hello_samza_spark.registry import all_queries  # noqa: E402
from samza_hello_samza_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402
from retime_r11 import WARMUP  # noqa: E402

KEYS = ("ann_sq8_batch_wide", "wand_tier_sweep_workload")


def main() -> None:
    spark = get_spark("freeze-r11b")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)

    def run(name: str, d: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, d).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    print(f"[freeze] warmup: {len(WARMUP)} varied plans at sf0.1")
    for name in WARMUP:
        run(name, sf_dir)

    for tier_dir, tag in ((sf_dir, "sf0.1"), (None, "sf1")):
        if tier_dir is None:
            from scale_probe import build_scaled

            tier_dir = build_scaled(spark, 10)
            print(f"[freeze] sf1 dir {tier_dir}")
        # layout warmups (uncounted): the SQ8 code layout + BM25
        # posting layout for this tier's dir tag
        run("ann_sq8_indexed_topk", tier_dir)
        run("bm25_search_indexed", tier_dir)
        for k in KEYS:
            run(k, tier_dir)  # warm the key's own first-call paths
        spark._jvm.System.gc()
        canary = min(run("groupby_count", tier_dir) for _ in range(2))
        load1 = os.getloadavg()[0]
        print(
            f"[freeze] canary groupby_count {tag} {canary:.3f}, "
            f"load {load1:.2f}/{os.cpu_count()}"
        )
        for k in KEYS:
            passes = [run(k, tier_dir) for _ in range(3)]
            print(
                f"[freeze] {k} {tag} passes "
                + "/".join(f"{p:.3f}" for p in passes)
                + f" -> min {min(passes):.3f}"
            )

    spark.stop()


if __name__ == "__main__":
    main()

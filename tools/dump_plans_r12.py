#!/usr/bin/env python3
"""Dump `.explain("formatted")` for the named keys to plans/r12/.

Usage: dump_plans_r12.py SUFFIX [KEY ...]
  SUFFIX is "before" or "after"; default keys = the keys round 12
  touches (VERDICT r11 "Next round" items #3-#6 + the corpus-linear
  persist downgrades). Plans are captured at sf0.1 (the bench tier)
  so PushedFilters / partition counts match what the bench executes.
Run the "before" pass from a worktree at the r11 verdict commit.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from samza_hello_samza_spark.registry import all_queries  # noqa: E402
from samza_hello_samza_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get(
    "SPARK_GRAFT_PLANS_OUT", os.path.join(HERE, "plans", "r12")
)

DEFAULT_KEYS = (
    # WAND probe fuse (single-query) + its consumers
    "bm25_search_wand",
    "hybrid_search_indexed",
    "hybrid_filtered_indexed",
    # batch-WAND job collapse
    "bm25_batch_wand",
    "hybrid_batch_indexed",
    # corpus-linear localCheckpoint -> recomputable persist
    "minhash_jaccard_estimate",
    "lsh_band_sweep",
    "dedup_incremental",
    "contamination_minhash",
    "bigram_lm_nll",
    "text_contamination",
    "contamination_bloom",
    # watch items / profiled-not-changed
    "bm25_batch_wide",
    "bm25_batch_indexed",
    "session_order_overlap",
)


def main() -> None:
    argv = sys.argv[1:]
    suffix = argv[0] if argv else "before"
    keys = tuple(argv[1:]) or DEFAULT_KEYS
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-plans-r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    queries = all_queries()
    for k in keys:
        fn = queries.get(k)
        if fn is None:
            print(f"skip {k}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            plan = f"ERROR: {exc}"
        with open(os.path.join(OUT, f"{k}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"dumped {k}_{suffix}.txt ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()

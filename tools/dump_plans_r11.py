#!/usr/bin/env python3
"""Dump `.explain("formatted")` for the named keys to plans/r11/.

Usage: dump_plans_r11.py SUFFIX [KEY ...]
  SUFFIX is "before" or "after"; default keys = the round's heavy set.
Plans are captured at sf0.1 (the bench tier) so PushedFilters /
partition counts match what the bench executes.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from samza_hello_samza_spark.registry import all_queries  # noqa: E402
from samza_hello_samza_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(HERE, "plans", "r11")

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
    suffix = argv[0] if argv else "before"
    keys = tuple(argv[1:]) or DEFAULT_KEYS
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-plans-r11")
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

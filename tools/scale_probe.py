#!/usr/bin/env python3
"""Empirical scaling probe: do the headline plans scale ~linearly?

Builds an N×-replicated copy of the fact tables (events, documents,
lineitem, orders, embeddings — ids offset per replica so keys stay
unique and joins stay consistent; dims copied as-is), times a set of
representative operators at 1× and N×, and reports the wall-time
ratio against the data ratio. A plan whose time grows ≫ data (pair
explosions, driver collects, single-partition windows) fails here
long before a cluster run would.

Near-dup pair operators (jaccard/minhash) are deliberately excluded:
replicating documents N× creates N-sized duplicate cliques, so their
pair OUTPUT grows quadratically by construction — that is a property
of the synthetic replication, not of the plans.

Usage:  python tools/scale_probe.py [REPL]      (default 4)
Writes: SCALING.md + one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from samza_hello_samza_spark.registry import all_queries
from samza_hello_samza_spark.session import TABLES, get_spark, load_table

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED_ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")

#: representative plans: scans, shuffled aggs, joins, windows,
#: prefix sums, sketches, classifier, exact dedup, iterative pagerank
#: is excluded (its input is the pair table — see module docstring).
PROBE_OPS = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "groupby_count",
    "tumbling_window",
    "session_window",
    "wikipedia_stats",
    "wordcount",
    "dedup_exact",
    "dedup_url",
    "text_quality",
    "quality_classifier",
    "heavy_hitters_cms",
    "mixture_sample",
    "corpus_profile",
    "sequence_packing",
    "events_time_rollup",
    "top_events_per_user",
    "purchase_attribution",
    "user_state_scd2",
    "parts_skyline",
    "orders_open_backlog",
    "customer_pareto_curve",
    "events_window_funnel",
    "priority_fulfillment_sla",
    "session_paths",
    "cohort_ltv_curve",
    "user_event_entropy",
    "time_weighted_value",
    "redelivery_dedup",
    "order_size_distribution",
    "winsorize_values",
    "group_capped_sample",
    "data_quality_report",
    "audience_overlap",
    "trigram_lm",
    "basket_pmi",
    "basket_rules",
    "text_contamination",
    "contamination_bloom",
    "export_shards",
    "session_order_overlap",
    "domain_kl_divergence",
    "zipf_slope",
    "kneser_ney_bigram",
    "token_budget_plan",
    # r04 additions (graph_kcore is excluded with the rest of the
    # pair-graph family — replication manufactures duplicate cliques)
    "dsir_importance",
    "dedup_window_exact",
    "dedup_window_incremental",
    "events_mixed_rollup",
    "embedding_quantize_int8",
    "asof_last_order",
    "asof_next_order",
    "range_join_value_bands",
    "stream_stream_join_bucketed",
    "segment_migration",
    # r04b additions. minhash_jaccard_estimate sits with the excluded
    # pair family (replication manufactures duplicate cliques);
    # lineitem_pruned_scan is excluded for mv_event_type_stats' reason
    # — its z-order+zonemap state caches per sf_dir, so the first N×
    # run would time the layout BUILD, not the pruned serving read.
    "ab_test_report",
    "growth_accounting",
    # mv_event_type_stats is excluded: its MV build-once cache keys on
    # the sf_dir, so 1× (warm) vs N× (cold build) ratios would compare
    # serving against building.
    # r05 additions. The q6/q19 pruned-scan twins are excluded for the
    # same build-once reason as lineitem_pruned_scan (per-sf_dir
    # layout cache); leakage_safe_split sits with the excluded
    # pair-graph family (it groups by near-dup components).
    "sequence_packing_curriculum",
    "train_val_test_split",
    # r05b additions. returned_items_pruned_scan is excluded for the
    # build-once layout-cache reason above.
    "sequence_packing_materialize",
    "quantile_kmv_calibration",
    "epoch_shuffle_plan",
    # r06 addition: curriculum-keyed packed-sequence assembly.
    "sequence_packing_curriculum_materialize",
    # r06c additions: single-scan ruleset + LM-tercile composition.
    "gopher_quality_filters",
    "ccnet_perplexity_buckets",
    "c4_quality_filters",
    "hybrid_search",
    # r06f addition: iterative GD trainer (20 aggregate scans — the
    # ratio shows per-scan growth; dedup_clusters_twostar,
    # contamination_minhash and dedup_prefix_filter sit with the
    # excluded pair-graph family: replication manufactures duplicate
    # cliques so their OUTPUT grows quadratically by construction;
    # orders_table_history is a manifest-only read — bounded).
    "train_quality_classifier",
    # r06f addition: K one-scan argmax rounds, driver state K×DIM.
    "kcenter_coreset",
    # r07 additions: in-scan quantized ANN (bounds agg + codegen scan;
    # the committed-layout twins sit in WARMED_PROBE_OPS), the audience
    # sketch algebra, and the batch-query retrieval eval.
    "ann_sq8_topk",
    "ann_sq8_rerank_topk",
    "ann_binary_topk",
    "ann_binary_rerank_topk",
    "audience_kmv_setops",
    "embedding_knn_eval",
    # r07f additions: the in-scan MRL probe (prefix slice + rerank —
    # one pruned scan; the committed twin sits in WARMED_PROBE_OPS)
    # and the pinned-version snapshot read. dedup_lsh_eval and
    # graph_label_propagation sit with the excluded pair-graph family
    # (replication manufactures duplicate cliques).
    "ann_mrl_topk",
    # r08: the second MRL rung — same in-scan shape, wider slice.
    # dedup_lsh_eval_stratum and lsh_band_sweep sit with the excluded
    # pair-graph family (stratum pair compositions).
    "ann_mrl32_topk",
    "orders_time_travel",
    # r07h: composition of the four in-scan probes above — one scan
    # each + 10-row intersections. corpus_dedup_report sits with the
    # excluded pair-graph family (it composes the clusters relation).
    "ann_recall_curve",
)

#: index/layout-backed keys whose per-sf_dir build is a one-time
#: cache (ANN discipline: the build is warmup, the query is the
#: steady-state serving read). Previously these were EXCLUDED because
#: the single-shot 1× (warm) vs N× (cold build) comparison timed
#: building against serving; each now gets one UNCOUNTED run per dir
#: before its timed run, so the ratio compares steady-state serving —
#: which is exactly the claim a file-skipping layout makes (near-flat
#: across data growth).
#: full-corpus byte audits: the op's CONTRACT is to read every
#: exported byte (integrity checks), so ~repl× time on repl× data is
#: the correct shape — reported next to, not inside, the plan worst.
LINEAR_BY_CONTRACT = {
    "jsonl_export_audit",
    "packed_webdataset_audit",
    # r08: the ingest audit's contract is to checksum EVERY posting
    # row of the incremental layout — ~repl× time on repl× data.
    "positional_ingest_audit",
    # r09c: same contract for the ranked layout's ingest audit.
    "bm25_ingest_audit",
}

WARMED_PROBE_OPS = (
    "lineitem_pruned_scan",
    "q6_pruned_scan",
    "q19_pruned_scan",
    "returned_items_pruned_scan",
    "embedding_box_scan",
    "orders_point_lookup_bloom",
    "term_search_indexed",
    "orders_cdf_changes",
    "mv_event_type_stats",
    # r06b: filtered vector search (attr-bearing IVF layout build is
    # the warmed step; serving reads nprobe lists + pushed filter)
    "ann_filtered_topk",
    "ann_filtered_ivf_topk",
    # r06f: the composed IVFADC layout builds once per dir — same
    # warmed discipline (it sat in PROBE_OPS for one run and its
    # first-N× number timed the BUILD, 13×; miscategorization, not a
    # plan regression — steady-state re-measured at 1.1×).
    "ann_ivfpq_topk",
    # r07: committed quantized layouts (sig/SQ8 words, attrs), the
    # marker-gated incremental join-MV, and the tar-corpus audit
    # (export is the warmed step, the timed run re-reads the tars).
    "ann_binary_indexed_topk",
    "ann_filtered_binary_topk",
    "ann_sq8_indexed_topk",
    "ann_filtered_sq8_topk",
    "orders_cdf_join_mv",
    "packed_webdataset_audit",
    # r07f/g: committed MRL prefix layout, the JSONL shard export
    # (export is the warmed step, the timed run audits the bytes),
    # and the positional posting layout (build warmed, phrase probe
    # is the bucket-pruned serving read).
    "ann_mrl_indexed_topk",
    "jsonl_export_audit",
    "phrase_search_indexed",
    "proximity_search_indexed",
    # r08: the two-batch positional build is the warmed step (the
    # timed run is the full-postings integrity scan — linear by
    # contract), and the 4-version table + MV build is the warmed
    # step of the restore drill (the timed run is the no-op cycles +
    # MV read).
    "positional_ingest_audit",
    "orders_restore_audit",
    # r08b: the BM25 posting layout builds once per dir; the timed
    # runs are the bucket-pruned ranked probes (single + batch).
    "bm25_search_indexed",
    "bm25_batch_indexed",
    # r09: the impact-bound probe over the same layout (tier dirs +
    # candidate completion; fixed orchestration cost, pruned bytes),
    # and the 240-query generated batch (one pruned union read).
    "bm25_search_wand",
    "bm25_batch_wide",
    # r09b: per-query bound routing over the mixed-vocab batch.
    "bm25_batch_wand",
    # r09c: two-batch ingest build warmed; timed run is the audit scan.
    "bm25_ingest_audit",
    # r10: both committed layouts (tiered BM25 postings + SQ8 codes)
    # build warmed; the timed run is the two pruned serving probes +
    # the 20-row RRF fusion.
    "hybrid_search_indexed",
    # r10: one committed-code scan scoring the whole query batch, and
    # the batch hybrid fusing it with the WAND-routed lexical batch.
    "ann_sq8_batch_topk",
    "hybrid_batch_indexed",
    # r10: tier-cut decision table over the pinned terms' postings.
    "wand_tier_sweep",
    # r11: filtered hybrid — label-attr BM25 (segmented impacts) +
    # attr SQ8 layouts build warmed; timed run is the two
    # label-pushed pruned probes + 20-row RRF fusion.
    "hybrid_filtered_indexed",
    # r11: wide ADC batch (one code scan, 240-query window fanout)
    # and the workload tier sweep (one pruned union posting read).
    "ann_sq8_batch_wide",
    "wand_tier_sweep_workload",
)

#: join/agg/window headliners probed under planted key skew — the ops
#: whose shuffles hash on user_id / orderkey and would feel a hot key.
SKEW_OPS = (
    "stream_table_join",
    "stream_table_join_salted",
    "groupby_count",
    "session_window",
    "tumbling_window",
    "top_events_per_user",
    "top_users_by_value",
    "user_event_entropy",
    "user_value_moving_avg",
    "time_weighted_value",
    "purchase_attribution",
    "events_window_funnel",
    "session_paths",
    "redelivery_dedup",
    "order_size_distribution",
    "q18_large_volume",
    # fact-fact join family (r04, VERDICT item 5): lineitem⋈orders on
    # the hot orderkey, per-supplier aggs on the hot suppkey, and the
    # views⋈clicks self-join on the hot user_id — the shapes where a
    # hot key means one sort-merge partition does pair-quadratic work.
    "q9_product_profit",
    "nation_trade_flow",
    "supplier_lead_time",
    # the pre-r05 naive views⋈clicks plan (2.9× at a 20%-hot user),
    # kept unregistered as the before/after baseline; the REGISTERED
    # stream_stream_join key now delegates to the time-bucketed
    # rewrite — comparisons shrink to temporally-plausible pairs.
    # (A salted variant was measured FIRST and made it worse, 4.75×:
    # both plans are broadcast joins, so a salt has no shuffle
    # partitions to spread and only multiplies the build side — see
    # stream_stream_join_bucketed's docstring.)
    "stream_stream_join_naive",
    "stream_stream_join",
)

#: probe-only baselines that are deliberately NOT in the registry.
from samza_hello_samza_spark.operators.samza_surface import (  # noqa: E402
    _stream_stream_join_naive,
)

UNREGISTERED_SKEW_OPS = {
    "stream_stream_join_naive": _stream_stream_join_naive,
}

SKEW_BEGIN = "<!-- SKEW:BEGIN -->"
SKEW_END = "<!-- SKEW:END -->"


def build_skewed(spark, frac: float) -> tuple[str, str]:
    """Two same-size Spark-written copies of the warehouse: a UNIFORM
    control (straight rewrite) and a SKEWED twin where ``frac`` of
    events rows are re-keyed to ONE user_id and ``frac`` of lineitem
    rows to ONE orderkey (deterministic pmod selection). Row counts
    and physical layout are identical — only the key distribution
    moves — so t(skew)/t(control) isolates how the plans behave when
    one shuffle key carries ~frac of the data (the AQE-skew-split /
    salted-join story on real skew). Timing against the driver's
    original parquet would instead measure its different file layout
    (measured ~1.3× slower scans), swamping the skew signal."""
    ctl_dir = os.path.join(SCALED_ROOT, "skew_control")
    out_dir = os.path.join(SCALED_ROOT, f"skew{int(frac * 100)}")
    marker = os.path.join(out_dir, "_BUILT")
    stamp = f"{frac}:v2"  # v2: also plants a hot l_suppkey (r04)
    if (
        os.path.exists(marker)
        and open(marker).read() == stamp
        and os.path.exists(os.path.join(ctl_dir, "_BUILT"))
    ):
        return ctl_dir, out_dir
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(ctl_dir, exist_ok=True)
    mod = int(round(1.0 / frac))
    for name in TABLES:
        load_table(spark, BASE_SF_DIR, name).write.mode("overwrite").parquet(
            os.path.join(ctl_dir, f"{name}.parquet")
        )
    with open(os.path.join(ctl_dir, "_BUILT"), "w") as f:
        f.write("control")
    for name in TABLES:
        df = load_table(spark, BASE_SF_DIR, name)
        if name == "events":
            hot = df.agg(F.min("user_id")).first()[0]
            df = df.withColumn(
                "user_id",
                F.when(
                    F.pmod(F.col("event_id"), F.lit(mod)) == 0, F.lit(hot)
                ).otherwise(F.col("user_id")),
            )
        elif name == "lineitem":
            hot = df.agg(F.min("l_orderkey")).first()[0]
            hot_supp = df.agg(F.min("l_suppkey")).first()[0]
            df = df.withColumn(
                "l_orderkey",
                F.when(
                    F.pmod(
                        F.xxhash64("l_orderkey", "l_linenumber"), F.lit(mod)
                    )
                    == 0,
                    F.lit(hot),
                ).otherwise(F.col("l_orderkey")),
            ).withColumn(
                # independent selection (different hash salt): the hot
                # suppkey rows are NOT the hot orderkey rows, so the
                # supplier-agg and orderkey-join probes skew separately
                "l_suppkey",
                F.when(
                    F.pmod(
                        F.xxhash64("l_orderkey", "l_linenumber", F.lit(7)),
                        F.lit(mod),
                    )
                    == 0,
                    F.lit(hot_supp),
                ).otherwise(F.col("l_suppkey")),
            )
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write(stamp)
    return ctl_dir, out_dir


def _scaling_md_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )


def _read_skew_block() -> str:
    try:
        text = open(_scaling_md_path()).read()
    except FileNotFoundError:
        return ""
    if SKEW_BEGIN in text and SKEW_END in text:
        return text[text.index(SKEW_BEGIN) : text.index(SKEW_END) + len(SKEW_END)]
    return ""


def run_skew_probe(spark, queries, frac: float) -> None:
    ctl_dir, skew_dir = build_skewed(spark, frac)
    queries["groupby_count"](spark, ctl_dir).write.mode("overwrite").format("noop").save()
    queries["groupby_count"](spark, skew_dir).write.mode("overwrite").format("noop").save()
    base = {}
    skew = {}
    for name in SKEW_OPS:
        fn = queries.get(name) or UNREGISTERED_SKEW_OPS[name]
        # uncounted codegen warmup: the first execution of a query
        # compiles its generated code (~100 ms); without this the
        # control side always pays it and every ratio reads ~0.7×.
        fn(spark, ctl_dir).write.mode("overwrite").format("noop").save()
        t0 = time.perf_counter()
        fn(spark, ctl_dir).write.mode("overwrite").format("noop").save()
        base[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, skew_dir).write.mode("overwrite").format("noop").save()
        skew[name] = round(time.perf_counter() - t0, 3)
    rows = [
        (n, base[n], skew[n], round(skew[n] / base[n], 2) if base[n] > 0 else None)
        for n in SKEW_OPS
    ]
    worst = max((r for *_x, r in rows if r is not None), default=0)
    lines = [
        SKEW_BEGIN,
        "",
        "## Skewed-key probe (same data size, hot-key distribution)",
        "",
        f"{int(frac * 100)}% of events rows re-keyed to ONE user_id and",
        f"{int(frac * 100)}% of lineitem rows to ONE orderkey (row counts",
        "unchanged; both sides are Spark-written copies with identical",
        "physical layout, so file-format effects cancel). Ratio =",
        "t(skewed) / t(uniform control) on identical volume: ≈1× means",
        "the plan absorbs a hot key (AQE skew-split on shuffle joins,",
        "partial aggregation on groupBys); a blowup gets a rewrite —",
        "salting (operators/skew.py) when the straggler is a SHUFFLE",
        "partition, comparison-reduction (time bucketing, as in",
        "stream_stream_join_bucketed) when the plan is a broadcast",
        "join and the cost is probe-match iterations, which a salt",
        "cannot spread (measured: salt made it 4.75×, bucketing ~1×).",
        "",
        "| operator | t(uniform) s | t(skewed) s | ratio |",
        "| --- | --- | --- | --- |",
    ]
    for name, b, s, r in sorted(rows, key=lambda x: -(x[3] or 0)):
        lines.append(f"| {name} | {b:.3f} | {s:.3f} | {r}× |")
    lines += [
        "",
        f"Worst skew ratio this run: **{worst}×** at a {int(frac*100)}%-hot key.",
        "",
        SKEW_END,
    ]
    path = _scaling_md_path()
    try:
        text = open(path).read()
    except FileNotFoundError:
        text = "# SCALING\n"
    if SKEW_BEGIN in text and SKEW_END in text:
        text = (
            text[: text.index(SKEW_BEGIN)]
            + "\n".join(lines)
            + text[text.index(SKEW_END) + len(SKEW_END) :]
        )
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines) + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(
        json.dumps(
            {
                "metric": "skew_probe_time_ratio",
                "hot_frac": frac,
                "worst_ratio": worst,
                "uniform_sec": base,
                "skewed_sec": skew,
            }
        )
    )


#: per-table (id columns to offset, row-count column for stride).
_FACT_OFFSETS = {
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
}


def build_scaled(spark, repl: int) -> str:
    out_dir = os.path.join(SCALED_ROOT, f"x{repl}")
    marker = os.path.join(out_dir, "_BUILT")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # one shared stride keeps orders.o_orderkey and lineitem.l_orderkey
    # consistent so join fan-out is preserved exactly.
    strides: dict[str, int] = {}
    for name in TABLES:
        df = load_table(spark, BASE_SF_DIR, name)
        for col in _FACT_OFFSETS.get(name, ()):
            key = "orderkey" if col.endswith("orderkey") else col
            if key not in strides:
                strides[key] = int(df.agg(F.max(col)).first()[0]) + 1
    for name in TABLES:
        df = load_table(spark, BASE_SF_DIR, name)
        offsets = _FACT_OFFSETS.get(name)
        if offsets:
            parts = []
            for r in range(repl):
                part = df
                for col in offsets:
                    key = "orderkey" if col.endswith("orderkey") else col
                    part = part.withColumn(
                        col, (F.col(col) + F.lit(r * strides[key])).cast("long")
                    )
                parts.append(part)
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        else:
            scaled = df
        scaled.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write(str(repl))
    return out_dir


def time_ops(
    spark, queries, sf_dir: str, wand_capture: dict | None = None
) -> dict[str, float]:
    # min-of-2 after GC — the bench.py contention lesson applied here
    # too: the probe runs ~90 ops late in one long-lived JVM, and a
    # single-shot reading under accumulated heap pressure once showed
    # q19_pruned_scan at 4.6 s where min-of-2 steady state is 1.0 s.
    spark._jvm.System.gc()
    out = {}
    for name in (*PROBE_OPS, *WARMED_PROBE_OPS):
        fn = queries.get(name)
        if fn is None:
            continue
        if name in WARMED_PROBE_OPS:
            # uncounted: builds the per-sf_dir layout/index/MV cache
            # (and compiles codegen), so the timed run below measures
            # steady-state serving on BOTH dirs.
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        if name == "bm25_batch_wand" and wand_capture is not None:
            # snapshot RIGHT AFTER the 240-query workload ran — later
            # ops (the 5-query hybrid batch) overwrite last_stats
            from samza_hello_samza_spark.sources.inverted import (
                bm25_batch_wand_topk,
            )

            st = bm25_batch_wand_topk.last_stats
            wand_capture.update(
                {
                    k: st.get(k)
                    for k in (
                        "n_accumulator_rows",
                        "n_candidate_rows",
                        "n_prunable",
                        "n_fallback",
                    )
                }
            )
    return out


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    if len(sys.argv) > 1 and sys.argv[1] == "skew":
        frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
        run_skew_probe(spark, queries, frac)
        return

    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    scaled_dir = build_scaled(spark, repl)
    # warmup both dirs (codegen + file listing, uncounted)
    queries["groupby_count"](spark, BASE_SF_DIR).write.mode("overwrite").format("noop").save()
    queries["groupby_count"](spark, scaled_dir).write.mode("overwrite").format("noop").save()

    # crossover telemetry (VERDICT r09 #6): the batch-WAND accumulator
    # counters, snapshotted inside time_ops right after the 240-query
    # workload runs at each tier.
    wand_base: dict = {}
    wand_scaled: dict = {}
    base = time_ops(spark, queries, BASE_SF_DIR, wand_capture=wand_base)
    scaled = time_ops(spark, queries, scaled_dir, wand_capture=wand_scaled)

    rows = []
    for name in base:
        ratio = round(scaled[name] / base[name], 2) if base[name] > 0 else None
        rows.append((name, base[name], scaled[name], ratio))

    lines = [
        "# SCALING — measured wall-time growth vs data growth",
        "",
        f"Fact tables replicated **{repl}×** (ids offset per replica; joins",
        f"preserved), dims unchanged; run on local[{spark.sparkContext.defaultParallelism}]",
        f"at base `{BASE_SF_DIR}`. A plan is scale-safe when its time ratio",
        f"stays at or below the {repl}× data ratio (sub-linear = fixed",
        "overheads amortizing; super-linear = pair blowup / driver",
        "funnel / non-scalable shuffle — the probe exists to catch these).",
        "",
        f"| operator | t(1×) s | t({repl}×) s | ratio |",
        "| --- | --- | --- | --- |",
    ]
    for name, b, s, r in sorted(rows, key=lambda x: -(x[3] or 0)):
        lines.append(f"| {name} | {b:.3f} | {s:.3f} | {r}× |")
    worst = max((r for *_x, r in rows if r is not None), default=0)
    worst_plan = max(
        (r for n, *_x, r in rows if r is not None and n not in LINEAR_BY_CONTRACT),
        default=0,
    )
    lines += [
        "",
        f"Worst ratio this run: **{worst}×** against a {repl}× data"
        f" increase; worst outside the declared-linear byte audits:"
        f" **{worst_plan}×**.",
        "",
        "Full-corpus BYTE AUDITS (jsonl_export_audit,",
        "packed_webdataset_audit when present) are linear BY CONTRACT:",
        "an integrity check that reads every exported byte must cost",
        "~data× — sub-linearity there would mean the audit skipped",
        "bytes. They are listed (honesty) but annotated here so the",
        "headline worst isn't mistaken for a plan defect.",
        "",
        "Near-dup pair ops (jaccard/minhash/simhash/pagerank) are excluded:",
        "N×-replicating documents creates N-sized duplicate cliques, so",
        "their pair output grows quadratically by construction — an",
        "artifact of the synthetic replication, not of the band-join plans.",
        "",
        "Index/layout-backed keys (the pruned-scan family, the Bloom point",
        "lookup, the posting-list search, the CDF read, MV serving) are",
        "probed WARMED: one uncounted run per dir builds the per-dir",
        "layout cache, the timed run measures steady-state serving — the",
        "file-skipping claim is precisely that serving stays near-flat as",
        "data grows.",
    ]
    if wand_base.get("n_accumulator_rows") and wand_scaled.get(
        "n_accumulator_rows"
    ):
        def _shrink(d: dict) -> str:
            return f"{d['n_candidate_rows'] / d['n_accumulator_rows']:.3f}"

        lines += [
            "",
            "## Batch-WAND accumulator crossover (r10, measured)",
            "",
            "The (query, doc) accumulator is the stage that dominates",
            "batch ranking at 100 TB; the per-query θ bound exists to",
            "shrink it (candidates ≈ k·queries + boundary slack, vs",
            "matches ≈ Σ_q df(q)). The measured curve on the 240-query",
            "mixed workload — matches grow with the corpus, candidates",
            "grow with k·queries, so the kept fraction FALLS with scale",
            "(the crossover the ~3× fixed stage premium buys):",
            "",
            "| tier | pre-θ accumulator rows | post-θ candidate rows |"
            " kept | prunable/fallback |",
            "| --- | --- | --- | --- | --- |",
            f"| 1× | {wand_base['n_accumulator_rows']} |"
            f" {wand_base['n_candidate_rows']} | {_shrink(wand_base)} |"
            f" {wand_base['n_prunable']}/{wand_base['n_fallback']} |",
            f"| {repl}× | {wand_scaled['n_accumulator_rows']} |"
            f" {wand_scaled['n_candidate_rows']} | {_shrink(wand_scaled)} |"
            f" {wand_scaled['n_prunable']}/{wand_scaled['n_fallback']} |",
        ]
    skew_block = _read_skew_block()  # keep an existing skew section
    with open(_scaling_md_path(), "w") as f:
        f.write("\n".join(lines) + "\n")
        if skew_block:
            f.write("\n" + skew_block + "\n")

    print(
        json.dumps(
            {
                "metric": "scale_probe_time_ratio",
                "repl": repl,
                "worst_ratio": worst,
                "worst_plan_ratio": worst_plan,
                "base_sec": base,
                "scaled_sec": scaled,
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""One-time r11 extraction (VERDICT r10 #1): every per-key frozen
bench baseline, hand-lifted from BASELINE.md prose with the supersede
chains applied (last wins), written into BASELINE.json under
"freezes". From r11 on, BASELINE.json IS the machine-readable source
of truth the bench 2x checker reads; BASELINE.md carries narrative
(methodology notes, adjudications) and each new freeze lands in BOTH.

Run once; idempotent (rewrites the freezes block from this literal).
Provenance of every number: BASELINE.md at commit 11abab4, the same
prose set the r10 judge recomputed against.
"""

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (key, sf0.1 freeze, sf1 freeze or None-if-excluded/absent,
#  sf0.1 supersede chain, sf1 supersede chain, note)
F = [
    # --- HEADLINE: r01 frozen table + per-round additions ---
    ("q1_pricing_summary", 1.050, 0.552, [], [], ""),
    ("q3_shipping_priority", 1.497, 1.313, [], [], ""),
    ("q5_local_supplier", 1.348, 1.106, [], [], ""),
    ("q6_forecast_revenue", 0.368, 0.267, [], [], ""),
    ("q10_returned_items", 0.913, 0.877, [], [], ""),
    ("part_type_stats", 0.680, 0.658, [], [], ""),
    ("groupby_count", 0.243, 0.217, [], [], "contention canary"),
    ("tumbling_window", 0.558, 0.813, [], [], ""),
    ("session_window", 0.796, 0.643, [], [], ""),
    ("stream_stream_join", 0.487, 0.922, [], [], ""),
    ("stream_table_join", 0.336, 0.390, [], [], ""),
    ("wikipedia_stats", 1.974, 2.620, [], [], ""),
    ("wordcount", 1.315, 0.384, [], [], ""),
    ("dedup_exact", 0.723, 1.267, [], [], ""),
    ("dedup_minhash_lsh", 2.283, None, [], [], "sf1-excluded: pair family"),
    ("text_quality", 0.636, 0.510, [], [], ""),
    ("ann_bruteforce_topk", 0.482, 0.513, [], [], ""),
    ("ann_lsh_topk", 0.547, 0.471, [], [], ""),
    ("events_funnel", 0.756, 0.892, [], [], ""),
    ("cohort_retention", 1.065, 1.612, [], [], ""),
    ("corpus_profile", 1.058, 1.220, [], [], ""),
    ("perplexity_proxy", 0.907, 0.984, [], [], ""),
    ("text_repetition", 0.872, 1.558, [], [], ""),
    ("sequence_packing", 0.847, 1.320, [], [], ""),
    ("events_cube", 0.492, 0.479, [], [], ""),
    ("quality_classifier", 0.694, 0.559, [], [], ""),
    ("mixture_sample", 0.555, 0.424, [], [], ""),
    ("heavy_hitters_cms", 1.245, 1.031, [], [], ""),
    ("ann_pq_topk", 0.956, 0.679, [], [], ""),
    ("doc_pagerank", 2.716, None, [6.452],
     [], "r03 rebaseline after graph._pairs_cached; sf1-excluded"),
    ("purchase_attribution", 0.555, 0.737, [], [], ""),
    ("user_state_scd2", 0.801, 0.832, [], [], ""),
    ("orders_open_backlog", 0.888, 1.372, [], [], ""),
    ("customer_pareto_curve", 1.737, 2.068, [], [], ""),
    ("events_window_funnel", 0.560, 0.771, [], [], ""),
    ("priority_fulfillment_sla", 2.057, 1.507, [], [], ""),
    ("session_paths", 1.623, 1.052, [], [], ""),
    ("trigram_lm", 4.277, 1.138, [], [], ""),
    ("cohort_ltv_curve", 1.512, 1.661, [], [], ""),
    ("triangle_count", 3.569, None, [7.355],
     [], "r03 rebaseline after graph._pairs_cached; sf1-excluded"),
    ("mv_event_type_stats", 0.353, None, [], [],
     "sf1-excluded: serving cache keys on sf_dir"),
    ("user_event_entropy", 0.499, 0.526, [], [], ""),
    ("basket_pmi", 2.772, 3.980, [], [], ""),
    ("data_quality_report", 2.297, 1.693, [], [], ""),
    ("text_novelty", 1.621, None, [], [], "sf1-excluded: pair family"),
    ("boilerplate_lines", 0.697, 0.701, [], [], ""),
    ("basket_rules", 2.471, 3.854, [], [5.309],
     "sf1 re-frozen r04 (min-of-2 discipline)"),
    ("contamination_bloom", 2.036, 1.969, [], [5.056],
     "sf1 re-frozen r04 (min-of-2 discipline)"),
    ("domain_kl_divergence", 0.826, 0.670, [], [1.082],
     "sf1 re-frozen r04 (min-of-2 discipline)"),
    ("zipf_slope", 0.454, 0.412, [], [0.613],
     "sf1 re-frozen r04 (min-of-2 discipline)"),
    ("session_order_overlap", 1.356, 4.611, [], [5.474],
     "sf1 re-frozen r04 (min-of-2 discipline)"),
    ("kneser_ney_bigram", 0.881, 1.123, [], [], ""),
    ("token_budget_plan", 0.557, 0.361, [], [], ""),
    ("dedup_chunk_exact", 1.283, 1.061, [], [], ""),
    ("events_time_rollup", 0.569, 0.785, [], [], ""),
    ("rolling_active_users", 0.850, 0.847, [], [], ""),
    ("rolling_active_users_approx", 0.597, 0.388, [], [], ""),
    ("top_events_per_user", 0.453, 0.412, [], [], ""),
    # --- EXTRA_VOLUME: r04+ additions ---
    ("redelivery_dedup", 0.853, 0.803, [], [], ""),
    ("winsorize_values", 0.632, 0.629, [], [], ""),
    ("order_size_distribution", 0.407, 0.522, [], [], ""),
    ("group_capped_sample", 0.178, 0.165, [], [], ""),
    ("audience_overlap", 0.449, 0.528, [], [], ""),
    ("text_contamination", 1.348, 2.083, [], [], ""),
    ("asof_last_order", 0.725, 0.861, [], [], ""),
    ("range_join_value_bands", 0.460, 0.386, [], [], ""),
    ("segment_migration", 1.244, 1.089, [], [], ""),
    ("dedup_window_exact", 1.329, 2.006, [], [], ""),
    ("dedup_simhash", 3.937, None, [], [], "sf1-excluded: pair family"),
    ("stream_stream_join_bucketed", 0.328, 0.955, [], [], ""),
    ("dsir_importance", 2.084, 4.244, [], [], ""),
    ("dedup_window_incremental", 1.693, 2.123, [], [], ""),
    ("events_mixed_rollup", 0.349, 0.401, [], [], ""),
    ("ab_test_report", 0.519, 0.678, [], [], ""),
    ("growth_accounting", 0.633, 0.688, [], [], ""),
    ("lineitem_pruned_scan", 0.449, 0.485, [], [], ""),
    ("asof_next_order", 0.897, 1.134, [], [], ""),
    ("embedding_quantize_int8", 0.389, 0.431, [], [], ""),
    ("graph_kcore", 1.808, None, [], [], "sf1-excluded: pair family"),
    ("minhash_jaccard_estimate", 4.705, None, [], [],
     "sf1-excluded: pair family"),
    ("q6_pruned_scan", 0.444, 0.495, [], [], ""),
    ("q19_pruned_scan", 0.484, 0.592, [], [], ""),
    ("sequence_packing_curriculum", 1.543, 2.058, [], [], ""),
    ("train_val_test_split", 0.500, 0.307, [], [], ""),
    ("leakage_safe_split", 5.958, None, [], [],
     "sf1-excluded: components family; r09 cut it to ~0.38 (cache)"),
    ("returned_items_pruned_scan", 0.425, 0.594, [], [], ""),
    ("sequence_packing_materialize", 1.318, 2.667, [], [], ""),
    ("quantile_kmv_calibration", 0.798, 1.050, [], [], ""),
    ("epoch_shuffle_plan", 0.364, 0.433, [], [], ""),
    ("embedding_box_scan", 0.271, 0.257, [], [], ""),
    ("orders_point_lookup_bloom", 0.205, 0.363, [], [], ""),
    ("term_search_indexed", 0.469, 0.595, [], [], ""),
    ("orders_cdf_changes", 1.471, 1.108, [], [], ""),
    ("sequence_packing_curriculum_materialize", 2.107, 3.525, [], [], ""),
    ("ann_filtered_topk", 0.562, 0.543, [], [], ""),
    ("ann_filtered_ivf_topk", 0.677, 0.577, [], [], ""),
    ("gopher_quality_filters", 0.795, 0.971, [], [], ""),
    ("ccnet_perplexity_buckets", 1.058, 1.448, [], [], ""),
    ("c4_quality_filters", 1.395, 1.066, [], [], ""),
    ("ann_ivfpq_topk", 1.090, 1.064, [], [], ""),
    ("hybrid_search", 1.535, 1.712, [], [], ""),
    ("dedup_prefix_filter", 6.359, None, [], [],
     "sf1-excluded: pair family"),
    ("ann_binary_topk", 0.440, 0.496, [], [], ""),
    ("ann_binary_rerank_topk", 0.669, 0.664, [], [], ""),
    ("ann_binary_indexed_topk", 0.214, 0.222, [], [], ""),
    ("ann_filtered_binary_topk", 0.355, 0.401, [], [], ""),
    ("packed_webdataset_audit", 1.216, 1.369, [0.991], [],
     "r09 re-freeze: the 0.991 was a low-side sample (r08 note); "
     "in-bench cold Python-worker init reads 2.1-2.9 — judge with "
     "the load sentinel"),
    ("ann_sq8_topk", 1.908, 4.346, [], [], ""),
    ("ann_sq8_indexed_topk", 0.858, 1.000, [], [], ""),
    ("ann_sq8_rerank_topk", 2.011, 2.379, [], [], ""),
    ("orders_cdf_join_mv", 0.225, 0.201, [], [], ""),
    ("audience_kmv_setops", 0.976, 1.169, [], [], ""),
    ("ann_filtered_sq8_topk", 1.194, 1.218, [], [], ""),
    ("embedding_knn_eval", 0.611, 0.836, [], [], ""),
    ("ann_mrl_topk", 0.516, 1.370, [], [], ""),
    ("ann_mrl_indexed_topk", 0.515, 1.853, [], [], ""),
    ("ann_mrl32_topk", 0.452, 0.442, [], [], ""),
    ("dedup_lsh_eval", 6.946, None, [], [], "sf1-excluded: pair family"),
    ("dedup_lsh_eval_stratum", 1.662, None, [], [],
     "sf1-excluded: replication manufactures cliques inside the stratum"),
    ("jsonl_export_audit", 0.155, 1.180, [], [], ""),
    ("graph_label_propagation", 1.381, None, [], [],
     "sf1-excluded: pair family"),
    ("phrase_search_indexed", 0.966, 1.957, [], [], ""),
    ("proximity_search_indexed", 0.556, 0.566, [], [], ""),
    ("positional_ingest_audit", 0.614, 1.496, [0.327], [],
     "r09 re-freeze: 0.327 was write-warm (layout built same run)"),
    ("orders_restore_audit", 0.371, 0.685, [], [], ""),
    ("lsh_band_sweep", 4.134, None, [], [], "sf1-excluded: pair family"),
    ("bm25_search_indexed", 0.668, 0.825, [], [], ""),
    ("bm25_batch_indexed", 1.169, 1.407, [], [], ""),
    ("bm25_search_wand", 1.581, 2.012, [1.992], [1.837],
     "r09 full-run numbers of record; solo pre-freeze is the "
     "conservative upper bound"),
    ("bm25_batch_wide", 1.501, 6.601, [1.747], [5.794],
     "sf0.1: r09 full-run record. sf1: r09b full-run record "
     "(supersedes the first r09 reading)"),
    ("ann_multiprobe_topk", 0.426, 1.374, [0.536], [3.422],
     "sf1 r09c re-freeze: the 3.422 first-bench carried cold-layout "
     "noise"),
    ("bm25_ingest_audit", 0.636, 1.123, [0.959], [],
     "r09c full-run numbers of record; the 0.959 solo steady-state "
     "stands as the conservative upper bound (first in-bench pass "
     "can be write-warm)"),
    ("bm25_batch_wand", 4.711, 11.352, [4.954], [],
     "r09b full-run numbers of record; r10 candidate checkpoint "
     "reads ~0.72x of the sf1 freeze"),
    # r10 additions: sf0.1 solo warm-JVM freezes (BASELINE.md),
    # sf1 first-bench values from the committed BENCH_LOCAL_r10 run
    # (the standing rule: sf1 baseline = first-bench tier value).
    ("hybrid_search_indexed", 3.253, 2.648, [], [],
     "sf0.1 r10 solo freeze; sf1 first-bench (BENCH_LOCAL_r10)"),
    ("ann_sq8_batch_topk", 1.629, 1.689, [], [],
     "sf0.1 r10 solo freeze; sf1 first-bench (BENCH_LOCAL_r10)"),
    ("hybrid_batch_indexed", 6.070, 6.104, [], [],
     "sf0.1 r10 solo freeze; sf1 first-bench (BENCH_LOCAL_r10)"),
    ("wand_tier_sweep", 1.093, 1.139, [], [],
     "sf0.1 r10 solo freeze; sf1 first-bench (BENCH_LOCAL_r10)"),
    ("hybrid_filtered_indexed", 3.534, 3.828, [], [],
     "r11 solo warm-JVM freezes (passes 4.51/7.07/3.53 and "
     "3.96/4.09/3.83; ambient load ~8/32) — filtered hybrid "
     "serving, round-trip-bound like hybrid_search_indexed"),
    ("ann_sq8_batch_wide", 3.837, 15.437, [], [],
     "r11 solo warm-JVM freezes (passes 3.99/3.84/4.15 and "
     "17.2/15.4/16.2; canaries 0.242/0.235 clean) — 240-query "
     "wide ADC batch; time ∝ corpus at fixed batch width (the "
     "one-scan window fanout shape, 4.0x on 10x data)"),
    ("wand_tier_sweep_workload", 2.110, 1.635, [], [],
     "r11 solo warm-JVM freezes (passes 2.50/2.82/2.11 and "
     "1.73/1.64/2.81) — workload tier sweep, one pruned union "
     "posting read (near-flat across 10x)"),
]


def main() -> None:
    path = os.path.join(HERE, "BASELINE.json")
    with open(path) as fh:
        doc = json.load(fh)
    freezes = {}
    for key, s01, s1, c01, c1, note in F:
        row = {"sf0.1": s01}
        if c01:
            row["sf0.1_chain"] = c01
        if s1 is not None:
            row["sf1"] = s1
            if c1:
                row["sf1_chain"] = c1
        if note:
            row["note"] = note
        freezes[key] = row
    doc["freezes_meta"] = {
        "rule": "per-key, per-tier: a bench reading above 2x its "
        "freeze is a violation UNLESS the run's contention evidence "
        "(canary ratio, load rows) marks it ambient; suspect rows "
        "get an isolated warm-JVM re-time before being believed "
        "(BASELINE.md 2x triage rule + r10 methodology note)",
        "provenance": "extracted r11 from BASELINE.md prose "
        "(last-supersede-wins), the same set the r10 judge "
        "recomputed; from r11 on every new freeze lands here first "
        "and BASELINE.md carries the narrative",
        "tiers": {"sf0.1": "SPARK_GRAFT_SF_DIR default corpus",
                  "sf1": "10x key-offset replication "
                  "(tools/scale_probe.build_scaled)"},
        "chains": "…_chain lists superseded values, oldest first",
    }
    doc["freezes"] = dict(sorted(freezes.items()))
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {len(freezes)} freezes to {path}")


if __name__ == "__main__":
    main()

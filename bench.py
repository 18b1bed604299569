#!/usr/bin/env python
"""Headline-query benchmark (driver contract: one JSON line to stdout).

Runs a representative slice of the registry — every operator class: scan+agg,
multi-join rollup, temporal change join, prefix rollup, window top-k,
event-time sessionization, sliding windows, minhash LSH dedup, brute-force
vector search, text stats — at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Each query is forced end-to-end with the noop sink (computes every output
column, unlike ``count()`` which lets Catalyst prune projections).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from census_data_pipeline_spark.plans import QUERIES  # noqa: E402
from census_data_pipeline_spark.session import get_spark  # noqa: E402

# The r2 headline set — FROZEN (VERDICT r2 #8) so round-over-round totals
# stay apples-to-apples; r3+ additions go in HEADLINE_NEW below.
HEADLINE_R02 = [
    "flagship_regional_rollup",
    "q1_pricing_summary",
    "q5_regional_revenue",
    "geoid_rollup_county",
    "change_over_time",
    "topk_per_nation",
    "normalize_zscore",
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "events_session_5m",
    "text_token_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "knn_bruteforce",
    "knn_lsh",
    "asof_click_purchase",
    "range_join_click_errors",
    "q6_forecast_revenue",
    "events_hypertable_rollup",
    "corpus_clean_pipeline",
    "text_chunking",
    # r2 breadth (VERDICT r1 #7): track the expensive extension tier
    "dedup_clusters",
    "linkage_edit1_names",
    "sample_stratified_events",
    "multimodal_frame_sample",
    "geo_bbox_contains",
    # r2 new operators
    "dedup_simhash_pairs",
    "geo_point_in_polygon",
    "events_interpolate_1h",
    "text_pii_scrub",
    "text_pack_bins",
    "zorder_locality",
    # r2 training-pipeline curation tier
    "text_repetition_stats",
    "decontam_ngram_overlap",
    "sample_temperature",
    "shuffle_shard_assign",
    "corpus_curation_e2e",
    # r2 event analytics + sketch rollup
    "events_funnel_3step",
    "cohort_retention_weekly",
    "events_top_transitions",
    "sketch_rollup_mergeable",
]

# Queries added after the r2 freeze: benched and counted in the grand
# total, reported under their own subtotal.
HEADLINE_NEW: list[str] = [
    "text_quality_scores",
    "dedup_clusters_star",
    "dedup_keep_canonical",
    "knn_ivf_seeded",
    "split_assign_docs",
    "sample_upweight_rare",
    # r4 additions
    "geo_polygon_overlap",
    "dedup_minhash_ml",
    "knn_ivf",
    "multimodal_audio_features",
    "multimodal_video_frames",
    "multimodal_image_dhash",
    "knn_pq_seeded",
    "knn_ivfpq_seeded",
    "dedup_spans",
    "search_bm25",
    "scd2_user_status",
    "graph_pagerank",
    "cdc_apply_changes",
    "text_unigram_logprob",
    "ivm_incremental_rollup",
    "events_rate_anomaly",
    "copurchase_topk",
    # r4 second batch
    "dedup_semantic",
    "text_dsir_logratio",
    "graph_triangles",
    "skyline_parts",
    "events_robust_outliers",
    "events_attribution",
    "events_rolling_median",
    "dedup_containment",
    "orders_winsorized",
    "linkage_entity_clusters",
    "decontam_semantic",
    "text_bigram_logprob",
    "classify_nearest_centroid",
    "text_chi2_features",
    "dq_suite_core",
    "dq_profile_orders",
    "orders_snapshot_diff",
    "events_ohlc_hourly",
    "events_time_weighted_avg",
    "revenue_share_of_parent",
    "corpus_vocab_stats",
    "orders_target_encoding",
    "drift_ks_click_vs_error",
    "drift_psi_purchase_value",
    "bloom_join_prune",
    "sample_weighted_docs",
    "scd2_snapshot_at",
    "events_gaps",
    "customer_rfm",
    "ab_test_conversion",
    "funnel_step_latency",
    "cohort_ltv_weekly",
    "dedup_against_reference",
    "orders_price_histogram",
    # r5 additions
    "text_bpe_merges",
    "text_bpe_segment",
    "text_pmi_pairs",
    "mine_hard_negatives",
    "search_hybrid_rrf",
    "sample_token_budget",
    "dedup_against_index",
    "text_tag_keywords",
    "text_normalize_unicode",
    "mix_build_e2e",
    "events_ewma",
    "cluster_kmeans_lloyd",
    "cluster_silhouette",
    "dq_benford_prices",
    "lineitem_exact_median_scalable",
    "drift_chi2_event_types",
    "ann_quality_lsh",
    "basket_rules_parts",
    "geo_nearest_site",
    # r6 additions (streaming_session_5m_append is measured by
    # bench_streaming.py with the other real-stream queries)
    "text_lang_id_nb",
    "text_gopher_rules",
    "dq_k_anonymity",
    "sketch_cms_heavy_hitters",
    "mine_hard_negatives_ivf",
    "geo_nearest_site_grid",
    "embedding_pca_power",
    "graph_label_propagation",
    "quality_logreg_train",
    "ivm_delta_join_refresh",
    "text_textrank_keywords",
    "graph_bfs_distances",
    "survival_time_to_purchase",
    # r8 additions
    "ivm_retraction_refresh",
    "embedding_pca_topr",
    "survival_by_segment",
    "survival_logrank",
    "events_forecast_hourly",
    "events_forecast_backtest",
    "dq_l_diversity",
    "quality_tree_train",
    "quality_tree_eval",
    "quality_gbt_train",
    "graph_trustrank",
    "search_ndcg_bm25",
    "events_forecast_conformal",
    "quality_logreg_calibration",
    "quality_logreg_auc",
    "quality_logreg_holdout",
    "quality_tree_holdout",
    "quality_gbt_holdout",
    "sample_neyman_customers",
    "sample_ht_estimate",
    "geo_dbscan_grid",
    # r9 additions (streaming_cusum_hourly stays in bench_streaming.py)
    "quality_gbt_classify",
    "quality_gbt_classify_holdout",
    "quality_logreg_cv",
    "quality_tree_cv",
    "quality_rf_train",
    "quality_rf_holdout",
    "quality_rf_importance",
    "graph_kcore",
    "sketch_hll_distinct",
    "quality_mi_features",
    "events_forecast_mase",
    "embedding_pca_project",
    "lineitem_corr_matrix",
    "events_trend_by_type",
    "orders_welch_by_priority",
    "text_zipf_fit",
    "quality_learning_curve",
    "events_hll_users_by_type",
    "orders_chi2_status_priority",
    # r10 additions
    "graph_coreness",
    "graph_modularity",
    "events_forecast_ar",
    "events_forecast_model_select",
    "quality_pr_auc",
    "graph_clustering",
    "graph_adamic_adar",
    "events_trend_theil_sen",
    "events_forecast_ar_whiteness",
    "sketch_quantiles_bottomk",
    # r10c additions
    "lineitem_anova_returns",
    "lineitem_bartlett_returns",
    "drift_wasserstein_click_error",
    "orders_cramers_v",
    "events_trend_kendall",
    "events_ccf_click_purchase",
    "customer_revenue_gini",
    "customer_revenue_concentration",
    "graph_components",
    "events_new_vs_returning",
    "events_session_paths",
    "text_readability",
    "embedding_quantize_sq8",
    "events_markov_stationary",
    "ab_test_bootstrap_ci",
    "events_decayed_user_value",
    "events_dow_hour_profile",
    "embedding_sq8_recall",
    "events_seasonal_anomaly",
    "events_markov_attribution",
    # r11 weighted graph tier + the Louvain refiner
    "graph_pagerank_weighted",
    "graph_weighted_distances",
    "graph_louvain_move",
    "graph_hits",
    "lineitem_welch_fdr",
    "embedding_truncation_recall",
    # r12 weighted community tier + multi-level Louvain
    "graph_modularity_weighted",
    "graph_louvain_weighted",
    "graph_louvain_multilevel",
    "embedding_mmr_rerank",
    # r13 weighted LPA/conductance + Leiden refinement
    "graph_lpa_weighted",
    "graph_conductance_weighted",
    "graph_leiden",
    "embedding_mmr_ivf",
    # REAL-streaming queries (streaming_tumbling_1h,
    # streaming_enriched_rollup, both interval joins, streaming_dedup,
    # streaming_ohlc) are excluded here by design — their cost is
    # state-store + micro-batch machinery, not engine operators — and
    # measured separately by bench_streaming.py (BENCH_STREAMING_r05).
]

HEADLINE = HEADLINE_R02 + HEADLINE_NEW

# Contention sentinel (VERDICT r3 #2): BENCH_r03 reported knn_lsh at
# 3.34 s where idle re-measurement gives 1.4-1.7 s — min-of-n does not
# protect when every run contends with an unrelated host load. A fixed
# calibration task (constant work, ~100 ms idle) is re-timed after every
# headline sample; a sample whose trailing calibration exceeds
# ``_SPIKE_FACTOR`` × the session's baseline is discarded and re-run
# (bounded budget), and anything still contaminated is flagged in the
# output instead of silently reported.
_SPIKE_FACTOR = 1.6
_EXTRA_BUDGET = 3  # extra attempts per query when samples get discarded


def _calibrate(spark) -> float:
    # min of 2 back-to-back runs: the first absorbs the ENGINE's own tail
    # after a heavy query (ContextCleaner GC, executor thread wind-down),
    # which would otherwise read as a host-load spike and burn re-run
    # budget on an idle machine (false positive observed after the MLlib
    # KMeans query). Sustained external load inflates both runs.
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr("sum(id * 2 + 1) AS s").collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="bench")

    # Warm-up (untimed): parquet footers, then one pass of every headline
    # query at the smallest scale factor. Spark's whole-stage-codegen cache
    # is keyed on generated source, so the sf0.001 pass compiles each
    # query's code once — the timed sf run then measures execution, not
    # JIT/compilation (standard warm-run benchmarking).
    spark.range(1000).selectExpr("sum(id)").collect()
    from census_data_pipeline_spark.sources.catalog import TABLES

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                QUERIES[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass

    # n runs per query, report min (primary) and mean: dedup_clusters /
    # linkage_edit1_names swing ±2.5 s with host load (SCALING.md), and
    # min-of-n keeps round-over-round deltas from being scheduling noise
    # (VERDICT r2 #7). r4: default raised to 3 + contention sentinel.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    cal_baseline = min(_calibrate(spark) for _ in range(5))
    # ROLLING spike reference (r10): the session-start baseline is a
    # fresh-JVM best case — after ~190 heavy queries the steady-state
    # calibration sits ~2× higher from heap/code-cache pressure alone,
    # which made the fixed-baseline sentinel discard 797 samples on an
    # IDLE host (BENCH_LOCAL_r10's first run). The reference is the
    # trailing-window MEDIAN (a trailing min re-fired on every normal
    # sample whenever one GC-free calibration dipped low — the
    # distribution is bimodal), capped at 2× the fresh baseline so
    # genuine sustained load cannot ratchet the reference up with it;
    # ``sustained_load`` still compares the session median against the
    # fresh baseline so cross-round drift stays visible.
    _ROLL_WINDOW = 30
    spikes = 0
    discarded = 0
    flagged: list[str] = []
    cal_max = cal_baseline
    cal_all: list[float] = []
    # Sub-2s swing guard (VERDICT r11 #4): r11 recorded dedup_minhash_lsh
    # 0.81 → 1.22 s and knn_bruteforce 0.50 → 0.68 s with ZERO code change
    # on either path — small-absolute swings the per-sample spike sentinel
    # cannot see. Before recording a ≥30% round-over-round swing on a
    # sub-2s query, take one extra batch of samples so a transient does
    # not become the round's number; a swing that SURVIVES the retry is
    # recorded and listed in calibration.swing_confirmed.
    prev_mins: dict[str, float] = {}
    # Numeric round sort (ADVICE r12): a lexicographic sort orders
    # r9 > r13, so any single-digit record (or round ≥ 100) would
    # silently become the swing baseline.
    prev_recs = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LOCAL_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", os.path.basename(p)).group(1)),
    )
    if prev_recs:
        try:
            with open(prev_recs[-1]) as fh:
                prev_mins = json.load(fh).get("queries", {})
        except Exception:
            prev_mins = {}
    swing_confirmed: list[str] = []

    mins: dict[str, float] = {}
    means: dict[str, float] = {}
    for name in HEADLINE:
        samples: list[float] = []
        contaminated: list[float] = []
        attempts = 0
        budget = runs + _EXTRA_BUDGET
        want = runs
        retried_swing = False
        while len(samples) < want and attempts < budget:
            attempts += 1
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            cal = _calibrate(spark)
            cal_all.append(cal)
            cal_max = max(cal_max, cal)
            recent = sorted(cal_all[-_ROLL_WINDOW:])
            roll_ref = min(recent[len(recent) // 2], cal_baseline * 2)
            if cal > _SPIKE_FACTOR * roll_ref:
                # host was loaded while (or right after) this sample ran —
                # its timing is untrustworthy in EITHER direction
                spikes += 1
                discarded += 1
                contaminated.append(dt)
                continue
            samples.append(dt)
            if len(samples) == want and not retried_swing:
                p = prev_mins.get(name)
                cur = min(samples)
                if (
                    p is not None and max(cur, p) < 2.0
                    and (cur > 1.3 * p or p > 1.3 * cur)
                ):
                    retried_swing = True
                    want += runs
                    budget += runs
        if retried_swing:
            p = prev_mins.get(name, 0.0)
            cur = min(samples) if samples else float("inf")
            if cur > 1.3 * p or p > 1.3 * cur:
                swing_confirmed.append(name)
        if not samples:
            # sustained load: keep the contaminated mins but say so
            samples = contaminated
            flagged.append(name)
        mins[name] = round(min(samples), 3)
        means[name] = round(sum(samples) / len(samples), 3)

    total = round(sum(mins.values()), 3)
    shared = round(sum(mins[n] for n in HEADLINE_R02), 3)
    record = {
                "metric": "headline_query_latency_total",
                "value": total,
                "unit": "sec",
                "queries": mins,
                "queries_mean": means,
                "runs": runs,
                "shared_with_r02": shared,
                "new_since_r02": round(total - shared, 3),
                "calibration": {
                    "baseline_sec": round(cal_baseline, 4),
                    "max_sec": round(cal_max, 4),
                    "median_sec": round(sorted(cal_all)[len(cal_all) // 2], 4)
                    if cal_all else round(cal_baseline, 4),
                    "spike_factor": _SPIKE_FACTOR,
                    "spikes": spikes,
                    "discarded_samples": discarded,
                    "still_contaminated": flagged,
                    "swing_confirmed": swing_confirmed,
                    # sustained moderate load inflates EVERY sample without
                    # tripping the per-sample spike threshold; a median
                    # calibration well above the session baseline is the
                    # tell (cross-run: compare baseline_sec too)
                    "sustained_load": bool(
                        cal_all
                        and sorted(cal_all)[len(cal_all) // 2]
                        > 1.25 * cal_baseline
                    ),
                },
                "sf": sf,
    }
    # full per-query record to disk (VERDICT r9 #2): the driver's
    # BENCH_r{N}.json keeps only a 2,000-char stdout tail, losing most
    # of the ~180 per-query timings — committing the complete record
    # (SPARK_GRAFT_BENCH_OUT, e.g. BENCH_LOCAL_r10.json) makes
    # round-over-round regressions auditable from artifacts;
    # tests/test_registry_order.py asserts the latest committed record
    # covers every current HEADLINE query.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()

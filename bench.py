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

import json
import os
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
]

HEADLINE = HEADLINE_R02 + HEADLINE_NEW


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
    # (VERDICT r2 #7).
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    mins: dict[str, float] = {}
    means: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        mins[name] = round(min(samples), 3)
        means[name] = round(sum(samples) / len(samples), 3)

    total = round(sum(mins.values()), 3)
    shared = round(sum(mins[n] for n in HEADLINE_R02), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_latency_total",
                "value": total,
                "unit": "sec",
                "queries": mins,
                "queries_mean": means,
                "runs": runs,
                "shared_with_r02": shared,
                "new_since_r02": round(total - shared, 3),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

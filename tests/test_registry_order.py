"""Registry-order contract: the driver verifies the first ~50 registered
queries (r1 evidence: CORRECTNESS_r01.json == registry positions 0-49), so
the checked prefix must cover every operator family and contain no
rows-only entries.

r5 adds the window-hygiene contract (VERDICT r4 #5): the union of all
driver CORRECTNESS rows recorded so far PLUS the current 50-slot prefix
must cover EVERY registered query — a future round cannot silently grow
an unverified tail of queries that never get a driver row. A new query
must either take a prefix slot or the test goes red.
"""

import glob
import json
import os

from census_data_pipeline_spark.plans import ORACLE, QUERIES

PREFIX_N = 50

# at least one anchor per operator family; every name must sit in the
# checked prefix (r5 rotation: the 19 never-driver-checked late-r4
# queries entered, displacing 19 r4-green queries whose families keep
# the anchors below — see plans/__init__.py docstring for the full swap)
FAMILY_REPRESENTATIVES = [
    # dedup
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_against_reference",   # cross-corpus incremental (new r5 slot)
    "dedup_against_index",       # materialized write-once index (r5)
    # similarity search
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivfpq_seeded",
    "ann_quality_lsh",           # recall@k / MRR evaluation (r5)
    # text / quality / decontamination
    "corpus_vocab_stats",        # vocabulary stats (new r5 slot)
    "text_tag_keywords",         # gazetteer gram-join tagging (r5)
    "text_normalize_unicode",    # Arrow NFC normalization (r5)
    "dq_benford_prices",         # Benford first-digit audit (r5)
    # sampling
    "sample_weighted_docs",      # weighted sampling (new r5 slot)
    "orders_target_encoding",    # leakage-safe target encoding (r5 slot)
    "sample_token_budget",       # per-source quota mix building (r5)
    "mix_build_e2e",             # dedup->quality->budget->shard (r5)
    # media
    "multimodal_video_frames",
    "cluster_kmeans_lloyd",      # SQL-replicated Lloyd training (r5)
    "cluster_silhouette",        # centroid-based quality metric (r5)
    # graph
    "graph_pagerank",
    # streaming / change-data (interval_join_outer rotated out for
    # cluster_silhouette — r4-green; three real-stream anchors remain)
    "streaming_dedup_events",    # exactly-once repair stream (r5 slot)
    "streaming_ohlc_hourly",     # stateful stream rollup (r5 slot)
    "scd2_snapshot_at",          # time travel over SCD2 (r5 slot)
    "streaming_session_5m",      # merging-session-state stream (r5)
    # events / analytics
    "events_ohlc_hourly",
    "events_time_weighted_avg",
    "events_gaps",
    "events_ewma",               # Horner-fold trailing EWMA (r5)
    "funnel_step_latency",
    "customer_rfm",
    "cohort_ltv_weekly",
    "ab_test_conversion",
    "basket_rules_parts",        # association-rule mining (r5)
    # r5 operators (new this round)
    "text_bpe_merges",
    "text_bpe_segment",
    "text_pmi_pairs",
    "mine_hard_negatives",
    "search_hybrid_rrf",
    # drift / profiling
    "drift_ks_click_vs_error",
    "drift_psi_purchase_value",
    "drift_chi2_event_types",    # categorical chi-square drift (r5)
    "orders_price_histogram",
    "lineitem_exact_median_scalable",  # bounded-memory exact median (r5)
    # rollup / joins / core
    "revenue_share_of_parent",
    "bloom_join_prune",
    "geo_nearest_site",          # reverse-geocoding argmin join (r5)
    "skew_salted_join",
    "approx_sketches",
    "rates_zero_policy",
]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked_union():
    seen = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            seen |= set(json.load(f))
    return seen


def test_prefix_is_fully_oracle_backed():
    prefix = list(QUERIES)[:PREFIX_N]
    rows_only = [n for n in prefix if n not in ORACLE]
    assert rows_only == [], (
        f"rows-only queries waste checked-prefix slots: {rows_only}"
    )


def test_prefix_covers_every_family():
    prefix = set(list(QUERIES)[:PREFIX_N])
    missing = [n for n in FAMILY_REPRESENTATIVES if n not in prefix]
    assert missing == [], f"families missing from checked prefix: {missing}"


def test_flagship_is_first():
    assert next(iter(QUERIES)) == "flagship_regional_rollup"


def test_every_query_callable_and_every_oracle_has_query():
    assert all(callable(fn) for fn in QUERIES.values())
    assert set(ORACLE) <= set(QUERIES)


def test_no_unverified_tail():
    """Window hygiene (VERDICT r4 #5): every registered query must have a
    driver CORRECTNESS row already, or occupy a slot in the current
    50-query prefix (so the NEXT driver run gives it one). Red means a
    query was registered without rotating it into the checked window."""
    seen = _driver_checked_union()
    prefix = set(list(QUERIES)[:PREFIX_N])
    tail = sorted(set(QUERIES) - seen - prefix)
    assert tail == [], (
        f"queries with no driver row and no prefix slot: {tail} — rotate "
        "them into _CHECKED_PREFIX (plans/__init__.py) or they will never "
        "be driver-verified"
    )

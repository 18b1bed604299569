"""Unit tests for the round-4 additions: semantic dedup (SemDeDup),
DSIR importance scoring, degree-ordered triangle counting, and the
two-phase 2-D skyline. Oracle parity runs separately in
test_oracle_parity.py; these pin the operator semantics directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from census_data_pipeline_spark.functions.graph import triangle_counts
from census_data_pipeline_spark.functions.similarity import semantic_dedup
from census_data_pipeline_spark.functions.text import dsir_logratio
from census_data_pipeline_spark.operators.skyline import skyline_2d


# -- semantic dedup ------------------------------------------------------
def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_drops_within_cell_duplicates(spark):
    # two exact duplicate pairs + one singleton; 2 centroids
    rows = [
        (1, [1.0, 0.0]), (2, [1.0, 0.0]),      # dup pair, cell of seed 1
        (3, [0.0, 1.0]), (4, [0.0, 1.0]),      # dup pair, other cell
        (5, [-1.0, -1.0]),                     # far singleton
    ]
    out = semantic_dedup(_emb_df(spark, rows), threshold=0.99, n_centroids=2)
    res = {r.id: r.kept for r in out.collect()}
    assert res[1] and not res[2]     # lowest id survives
    assert res[3] and not res[4]
    assert res[5]
    assert out.columns == ["id", "cell", "kept"]


def test_semantic_dedup_threshold_above_one_keeps_all(spark):
    rows = [(i, [float(i), 1.0]) for i in range(1, 8)]
    out = semantic_dedup(_emb_df(spark, rows), threshold=1.01, n_centroids=3)
    assert all(r.kept for r in out.collect())
    assert out.count() == 7


def test_semantic_dedup_misses_cross_cell_pairs(spark):
    """Documented SemDeDup approximation: near-duplicates that straddle
    a cell boundary are never paired. Seeds [1,0] and [0,1]; the pair
    (0.51,0.49)/(0.49,0.51) has cosine ~0.999 but lands in different
    cells — both survive."""
    rows = [
        (1, [1.0, 0.0]), (2, [0.0, 1.0]),
        (3, [0.51, 0.49]), (4, [0.49, 0.51]),
    ]
    out = semantic_dedup(_emb_df(spark, rows), threshold=0.9, n_centroids=2)
    res = {r.id: (r.cell, r.kept) for r in out.collect()}
    assert res[3][0] != res[4][0]  # split across cells
    assert res[3][1] and res[4][1]  # so both kept despite cosine >= 0.9


# -- DSIR importance -----------------------------------------------------
def test_dsir_target_docs_score_higher(spark):
    target_docs = [(i, "alpha beta gamma delta", "tgt") for i in range(10)]
    other_docs = [(100 + i, "zeta eta theta iota", "raw") for i in range(10)]
    df = spark.createDataFrame(
        target_docs + other_docs, "doc_id long, text string, source string"
    )
    out = dsir_logratio(df, target=F.col("source") == "tgt")
    scores = {r.doc_id: r.logratio for r in out.collect()}
    t = [scores[i] for i in range(10)]
    o = [scores[100 + i] for i in range(10)]
    assert min(t) > max(o)  # target-like text gets higher importance
    assert out.columns == ["doc_id", "n_tokens", "logratio"]


def test_dsir_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i % 5} common word", f"src{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    tgt = F.col("source") == "src0"
    a = sorted(map(tuple, dsir_logratio(df, tgt).collect()))
    b = sorted(map(tuple, dsir_logratio(df, tgt).collect()))
    assert a == b


# -- triangle counting ---------------------------------------------------
def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangles_k4(spark):
    # complete graph on 4 nodes: 4 triangles, every node in 3
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = {r.id: r.triangles for r in
           triangle_counts(_edges_df(spark, pairs)).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_star_has_none(spark):
    # hub-and-spoke: the skew shape degree-ordering exists for — no output
    pairs = [(0, i) for i in range(1, 30)]
    assert triangle_counts(_edges_df(spark, pairs)).count() == 0


def test_triangles_direction_and_duplicates_canonicalized(spark):
    # one triangle written with mixed directions and repeats
    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)]
    out = {r.id: r.triangles for r in
           triangle_counts(_edges_df(spark, pairs)).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangles_matches_naive_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(7)
    nodes = range(24)
    pairs = [(a, b) for a, b in itertools.combinations(nodes, 2)
             if rng.random() < 0.3]
    adj = set(pairs)
    naive = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= adj:
            for v in (a, b, c):
                naive[v] = naive.get(v, 0) + 1
    out = {r.id: r.triangles for r in
           triangle_counts(_edges_df(spark, pairs)).collect()}
    assert out == naive


# -- skyline -------------------------------------------------------------
def _naive_skyline(rows, max_x, max_y):
    def better(p, q):
        px = p[1] if max_x else -p[1]
        py = p[2] if max_y else -p[2]
        qx = q[1] if max_x else -q[1]
        qy = q[2] if max_y else -q[2]
        return px >= qx and py >= qy and (px > qx or py > qy)

    return sorted(q for q in rows if not any(better(p, q) for p in rows))


@pytest.mark.parametrize("max_x,max_y", [(True, True), (True, False),
                                         (False, True), (False, False)])
def test_skyline_matches_naive(spark, max_x, max_y):
    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 20), round(rng.uniform(0, 10), 2))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x int, y double")
    got = sorted(map(tuple, skyline_2d(
        df, "x", "y", maximize_x=max_x, maximize_y=max_y).collect()))
    assert got == _naive_skyline(rows, max_x, max_y)


def test_skyline_duplicates_both_survive(spark):
    rows = [(1, 5, 5.0), (2, 5, 5.0), (3, 4, 4.0)]
    df = spark.createDataFrame(rows, "id long, x int, y double")
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    assert got == [1, 2]  # identical points dominate only non-strictly


def test_skyline_equal_x_ties(spark):
    # same x, different y: only the best y at that x survives
    rows = [(1, 5, 1.0), (2, 5, 9.0), (3, 1, 10.0)]
    df = spark.createDataFrame(rows, "id long, x int, y double")
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    assert got == [2, 3]


def test_skyline_single_x_value(spark):
    # span == 0 exercises the constant-bucket guard
    rows = [(1, 7, 1.0), (2, 7, 3.0), (3, 7, 3.0)]
    df = spark.createDataFrame(rows, "id long, x int, y double")
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    assert got == [2, 3]


def test_skyline_nulls_excluded(spark):
    rows = [(1, 5, 5.0), (2, None, 9.0), (3, 6, None)]
    df = spark.createDataFrame(rows, "id long, x int, y double")
    got = [r.id for r in skyline_2d(df, "x", "y").collect()]
    assert got == [1]


# -- robust outliers -----------------------------------------------------
def test_robust_outliers_known_values(spark):
    # group A: values 1..9 plus a wild 100 -> median 5.5, MAD 2.5
    rows = [(i, "A", float(v)) for i, v in enumerate([1, 2, 3, 4, 5,
                                                      6, 7, 8, 9, 100])]
    from census_data_pipeline_spark.operators.outliers import robust_outliers

    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r.id: (r.robust_z, r.is_outlier)
           for r in robust_outliers(df, "v", ["g"]).collect()}
    # z(100) = 0.6745 * (100 - 5.5) / 2.5 = 25.49...
    assert out[9][1] is True
    assert abs(out[9][0] - round(0.6745 * 94.5 / 2.5, 6)) < 1e-9
    assert all(not out[i][1] for i in range(9))  # 1..9 all inliers


def test_robust_outliers_zero_mad_group(spark):
    from census_data_pipeline_spark.operators.outliers import robust_outliers

    rows = [(i, "C", 7.0) for i in range(5)] + [(9, "C", 1000.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r.id: (r.robust_z, r.is_outlier)
           for r in robust_outliers(df, "v", ["g"]).collect()}
    # MAD = median(|x - 7|) = 0 -> z undefined everywhere, nothing flagged
    assert all(z is None and not o for z, o in out.values())


def test_robust_outliers_ungrouped(spark):
    from census_data_pipeline_spark.operators.outliers import robust_outliers

    rows = [(i, float(i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = robust_outliers(df, "v")
    assert out.filter("is_outlier").count() == 0
    assert out.count() == 9


# -- touch attribution ---------------------------------------------------
def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double",
    )


def test_attribution_first_and_last_touch(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 10, 12, 0, 0)
    rows = [
        (1, t0, 7, "click", 0.0),
        (2, t0 + dt.timedelta(hours=1), 7, "view", 0.0),
        (3, t0 + dt.timedelta(hours=2), 7, "click", 0.0),
        (4, t0 + dt.timedelta(hours=3), 7, "purchase", 50.0),
        # a touch AFTER the conversion must not count
        (5, t0 + dt.timedelta(hours=4), 7, "view", 0.0),
    ]
    from census_data_pipeline_spark.operators.attribution import (
        touch_attribution,
    )

    out = touch_attribution(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.first_touch_type, r.last_touch_type) == ("click", "click")
    assert r.conversion_id == 4 and r.value == 50.0


def test_attribution_lookback_horizon_and_organic(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 10)
    rows = [
        # user 1: only touch is 10 days before -> outside 7-day lookback
        (1, t0 - dt.timedelta(days=10), 1, "click", 0.0),
        (2, t0, 1, "purchase", 5.0),
        # user 2: no touches at all
        (3, t0, 2, "purchase", 9.0),
    ]
    from census_data_pipeline_spark.operators.attribution import (
        touch_attribution,
    )

    out = {r.conversion_id: r for r in
           touch_attribution(_events_df(spark, rows)).collect()}
    assert len(out) == 2  # both conversions kept
    assert out[2].first_touch_type is None and out[2].last_touch_type is None
    assert out[3].first_touch_type is None


def test_attribution_timestamp_tie_uses_event_id(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 10)
    rows = [
        (10, t0, 3, "click", 0.0),
        (11, t0, 3, "view", 0.0),   # same ts, higher id
        (12, t0 + dt.timedelta(hours=1), 3, "purchase", 1.0),
    ]
    from census_data_pipeline_spark.operators.attribution import (
        touch_attribution,
    )

    r = touch_attribution(_events_df(spark, rows)).collect()[0]
    assert r.first_touch_type == "click"  # lower event_id on the tie
    assert r.last_touch_type == "view"    # higher event_id on the tie


# -- n-gram containment --------------------------------------------------
def test_containment_detects_subset(spark):
    from census_data_pipeline_spark.functions.dedup import (
        ngram_containment_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    article = ("today we report that " + quote
               + " and much more besides happened downtown")
    df = spark.createDataFrame(
        [(1, quote), (2, article), (3, "completely unrelated words here")],
        "doc_id long, text string",
    )
    out = {(r.contained_id, r.container_id): r.containment
           for r in ngram_containment_pairs(df, n=3, threshold=0.8).collect()}
    assert (1, 2) in out          # the quote IS contained in the article
    assert out[(1, 2)] == 1.0     # every quote shingle appears
    assert (2, 1) not in out      # the article is NOT contained in the quote
    assert all(k[0] != 3 and k[1] != 3 for k in out)


def test_containment_symmetric_for_identical_docs(spark):
    from census_data_pipeline_spark.functions.dedup import (
        ngram_containment_pairs,
    )

    t = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    out = {(r.contained_id, r.container_id): r.containment
           for r in ngram_containment_pairs(df, n=3, threshold=0.9).collect()}
    assert out == {(1, 2): 1.0, (2, 1): 1.0}


# -- winsorization -------------------------------------------------------
def test_winsorize_clamps_tails_only(spark):
    from census_data_pipeline_spark.operators.outliers import winsorize

    rows = [(i, "g", float(v)) for i, v in enumerate(range(1, 101))]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r.id: r.winsorized
           for r in winsorize(df, "v", ["g"], 0.05, 0.95).collect()}
    # p05 of 1..100 (linear interpolation) = 5.95; p95 = 95.05
    assert out[0] == 5.95          # v=1 clamped up
    assert out[99] == 95.05        # v=100 clamped down
    assert out[49] == 50.0         # middle untouched, exact input
    assert min(out.values()) == 5.95 and max(out.values()) == 95.05


def test_winsorize_grouped_independent_bounds(spark):
    from census_data_pipeline_spark.operators.outliers import winsorize

    rows = [(i, "a", float(i)) for i in range(10)] + [
        (100 + i, "b", 1000.0 + i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = winsorize(df, "v", ["g"], 0.1, 0.9)
    a_vals = [r.winsorized for r in out.filter("g = 'a'").collect()]
    b_vals = [r.winsorized for r in out.filter("g = 'b'").collect()]
    assert max(a_vals) < 10        # group a bounds from group a only
    assert min(b_vals) >= 1000.0


def test_winsorize_rejects_bad_bounds(spark):
    from census_data_pipeline_spark.operators.outliers import winsorize

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        winsorize(df, "v", lower=0.9, upper=0.1)


# -- entity clusters + semantic decontam ---------------------------------
def test_entity_clusters_transitive(spark):
    from census_data_pipeline_spark.functions.dedup import dup_clusters
    from census_data_pipeline_spark.functions.linkage import edit1_pairs

    # chain: abc ~ abd ~ abe (pairwise edit-1 via shared positions),
    # plus an isolated record
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "abe"), (9, "xyz")],
        "id long, name string",
    )
    pairs = edit1_pairs(df, "id", "name").select("id_a", "id_b")
    labels = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1}  # one entity, canonical = min id
    assert 9 not in labels               # unmatched records have no row


def test_semantic_contamination_flags_near_eval(spark):
    from census_data_pipeline_spark.functions.decontam import (
        decontaminate_semantic,
        semantic_contamination,
    )

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    tr = spark.createDataFrame(
        [(1, [0.99, 0.1]),    # near-duplicate of the eval item
         (2, [0.0, 1.0]),     # orthogonal
         (3, [-1.0, 0.0])],   # opposite
        "vec_id long, embedding array<float>",
    )
    flagged = semantic_contamination(tr, ev, threshold=0.9)
    rows = {r.vec_id: r.max_eval_cosine for r in flagged.collect()}
    assert set(rows) == {1}
    assert rows[1] > 0.9
    kept = decontaminate_semantic(tr, ev, threshold=0.9)
    assert sorted(r.vec_id for r in kept.collect()) == [2, 3]


# -- bigram LM -----------------------------------------------------------
def test_bigram_logprob_repetitive_beats_scrambled(spark):
    from census_data_pipeline_spark.functions.text import bigram_logprob

    # doc 1: perfectly predictable transitions; doc 2: same unigram
    # distribution, scrambled transitions
    df = spark.createDataFrame(
        [(1, "a b a b a b a b a b a b"),
         (2, "a a b b a b b a a b a b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.avg_logprob2 for r in bigram_logprob(df).collect()}
    assert out[1] > out[2]


def test_bigram_logprob_short_docs_omitted(spark):
    from census_data_pipeline_spark.functions.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "only"), (2, "two tokens")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.n_bigrams for r in bigram_logprob(df).collect()}
    assert rows == {2: 1}  # single-token doc has no bigram positions


# -- nearest-centroid classifier + chi2 ----------------------------------
def test_classify_nearest_centroid_separable(spark):
    from census_data_pipeline_spark.functions.similarity import (
        classify_nearest_centroid,
    )

    rows = (
        [(i, [1.0, 0.0], 0) for i in range(5)]
        + [(10 + i, [0.0, 1.0], 1) for i in range(5)]
        + [(99, [0.9, 0.1], 1)]   # labeled 1 but sits in class 0's region
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.vec_id: (r.pred_label, r.correct)
           for r in classify_nearest_centroid(df).collect()}
    assert all(out[i] == (0, True) for i in range(5))
    assert all(out[10 + i] == (1, True) for i in range(5))
    assert out[99][0] == 0 and out[99][1] is False  # the label-audit catch


def test_chi2_exclusive_token_tops_its_class(spark):
    from census_data_pipeline_spark.functions.text import (
        chi2_feature_selection,
    )

    rows = (
        [(i, "zebra common word", "a") for i in range(10)]
        + [(100 + i, "yak common word", "b") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = chi2_feature_selection(df, "source", top_k=2).collect()
    top = {(r["class"], r.rank): r.token for r in out}
    assert top[("a", 1)] == "zebra"   # class-exclusive token ranks first
    assert top[("b", 1)] == "yak"
    # shared tokens carry zero association
    chi = {(r["class"], r.token): r.chi2 for r in out}
    assert all(v > 0 for k, v in chi.items() if k[1] in ("zebra", "yak"))


# -- data quality --------------------------------------------------------
def test_dq_checks_on_dirty_data(spark):
    from census_data_pipeline_spark.operators import quality as dq

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 10), (3, 99)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    uniq = dq.uniqueness_violations(child, ["id"]).collect()
    assert [(r.id, r.n_rows) for r in uniq] == [(2, 2)]
    orph = dq.referential_orphans(child, parent, "fk", "pk").collect()
    assert [r.orphan_key for r in orph] == [99]
    summary = {r.check: r.n_violations for r in dq.dq_summary(
        dq.as_check(dq.uniqueness_violations(child, ["id"]), "u"),
        dq.as_check(dq.referential_orphans(child, parent, "fk", "pk"), "fk"),
        dq.expect(child, "fk_small", F.col("fk") < 50),
    ).collect()}
    assert summary == {"u": 1, "fk": 1, "fk_small": 1}


def test_dq_expect_null_counts_as_violation(spark):
    from census_data_pipeline_spark.operators import quality as dq

    df = spark.createDataFrame([(1.0,), (None,), (5.0,)], "v double")
    row = dq.expect(df, "v_positive", F.col("v") > 0).collect()[0]
    assert (row.check, row.n_violations) == ("v_positive", 1)  # the NULL


def test_dq_profile_columns(spark):
    from census_data_pipeline_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a")], "k long, s string"
    )
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert prof["k"].n_rows == 3 and prof["k"].n_nulls == 0
    assert prof["k"].n_distinct == 2
    assert (prof["k"].min_value, prof["k"].max_value) == ("1", "2")
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert (prof["s"].min_value, prof["s"].max_value) == ("a", "b")


# -- snapshot diff -------------------------------------------------------
def test_snapshot_diff_classifies_all_types(spark):
    from census_data_pipeline_spark.operators.change import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, None, "z")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "x"),      # unchanged
         (2, 25.0, "y"),      # changed (value)
         (3, 30.0, "z"),      # changed (NULL -> value, null-safe)
         (4, 40.0, "w")],     # added
        "k long, v double, s string",
    )
    out = {r.k: r.change_type
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "changed", 4: "added"}

    out2 = snapshot_diff(new, old, ["k"]).collect()
    by_key = {r.k: r for r in out2}
    assert by_key[4].change_type == "removed"
    assert by_key[4].new_v is None and by_key[4].old_v == 40.0


def test_snapshot_diff_compare_subset(spark):
    from census_data_pipeline_spark.operators.change import snapshot_diff

    old = spark.createDataFrame([(1, 1.0, "a")], "k long, v double, s string")
    new = spark.createDataFrame([(1, 1.0, "b")], "k long, v double, s string")
    # comparing only v: the s change is invisible
    r = snapshot_diff(old, new, ["k"], compare_cols=["v"]).collect()[0]
    assert r.change_type == "unchanged"


# -- target encoding -----------------------------------------------------
def test_target_encode_shrinks_rare_categories(spark):
    from census_data_pipeline_spark.functions.sampling import target_encode

    rows = [(i, "big", 10.0) for i in range(100)] + [(200, "rare", 100.0)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = {r.id: r.target_enc
           for r in target_encode(df, "cat", "y", alpha=10.0).collect()}
    g = (100 * 10.0 + 100.0) / 101  # global mean ~10.89
    # big category barely moves; the rare one shrinks hard toward prior
    assert abs(out[0] - 10.0) < 0.1
    assert abs(out[200] - (100.0 + 10 * g) / 11) < 1e-6


def test_target_encode_loo_excludes_own_row(spark):
    from census_data_pipeline_spark.functions.sampling import target_encode

    rows = [(1, "c", 0.0), (2, "c", 10.0), (3, "solo", 5.0)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = {r.id: r.target_enc
           for r in target_encode(df, "cat", "y", alpha=0.0,
                                  loo=True).collect()}
    # alpha=0: pure leave-one-out means
    assert out[1] == 10.0   # excludes its own 0
    assert out[2] == 0.0    # excludes its own 10
    assert out[3] == 5.0    # singleton -> global mean (0+10+5)/3


# -- drift detection -----------------------------------------------------
def test_ks_identical_and_disjoint(spark):
    from census_data_pipeline_spark.operators.drift import ks_statistic

    a = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    b = spark.createDataFrame([(float(i) + 1000,) for i in range(50)],
                              "v double")
    same = ks_statistic(a, a, "v").collect()[0]
    assert same.ks_stat == 0.0
    far = ks_statistic(a, b, "v").collect()[0]
    assert far.ks_stat == 1.0  # fully separated distributions


def test_ks_matches_scipy_convention_small(spark):
    from census_data_pipeline_spark.operators.drift import ks_statistic

    # hand-computed: a={1,2,3}, b={2,4}: sup|Fa-Fb| at x=3: |1 - 0.5|=0.5
    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    b = spark.createDataFrame([(2.0,), (4.0,)], "v double")
    assert ks_statistic(a, b, "v").collect()[0].ks_stat == 0.5


def test_psi_stable_vs_shifted(spark):
    from pyspark.sql import functions as SF

    from census_data_pipeline_spark.operators.drift import psi

    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)],
                                "v double")
    shifted = ref.select((SF.col("v") + 50.0).alias("v"))
    stable = psi(ref, ref, "v").agg(SF.sum("contribution")).first()[0]
    moved = psi(ref, shifted, "v").agg(SF.sum("contribution")).first()[0]
    assert abs(stable) < 1e-9          # identical data -> PSI ~ 0
    assert moved > 0.25                # half the mass left its bins


# -- bloom-filter join pruning -------------------------------------------
def test_bloom_no_false_negatives_and_bounded_fp(spark):
    import random

    from census_data_pipeline_spark.operators.bloom import (
        bloom_prefilter,
        optimal_params,
    )

    rng = random.Random(3)
    build_keys = sorted(rng.sample(range(100_000), 300))
    probe_keys = list(range(3000))
    build = spark.createDataFrame([(k,) for k in build_keys], "k long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    out = {r.k for r in bloom_prefilter(
        probe, build, "k", "k", expected_items=300, fpp=0.01).collect()}
    true_matches = set(build_keys) & set(probe_keys)
    assert true_matches <= out          # never loses a real match
    fp = len(out - true_matches)
    non_matches = len(probe_keys) - len(true_matches)
    assert fp / non_matches < 0.05      # ~1% expected; 5x slack
    m, k = optimal_params(300, 0.01)
    assert m >= 2048 and 1 <= k <= 16


def test_bloom_string_keys(spark):
    from census_data_pipeline_spark.operators.bloom import bloom_prefilter

    build = spark.createDataFrame([("alpha",), ("beta",)], "s string")
    probe = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",)], "s string"
    )
    out = {r.s for r in bloom_prefilter(
        probe, build, "s", "s", expected_items=2, fpp=0.001).collect()}
    assert {"alpha", "beta"} <= out
    assert len(out) <= 3  # tiny filter, at most one lucky collision


# -- algebraic invariants -------------------------------------------------
def test_winsorize_wider_bounds_clamp_fewer(spark):
    """Monotonicity: widening [lower, upper] can only reduce the number
    of clamped rows, and every clamped value moves INWARD. (True
    idempotence does NOT hold: interpolated percentiles of the clamped
    data shift off the tie mass at the bounds — don't assert it.)"""
    import random

    from census_data_pipeline_spark.operators.outliers import winsorize

    rng = random.Random(5)
    df = spark.createDataFrame(
        [(i, rng.gauss(0, 100)) for i in range(500)], "id long, v double"
    )
    narrow = winsorize(df, "v", lower=0.2, upper=0.8)
    wide = winsorize(df, "v", lower=0.02, upper=0.98)
    n_narrow = narrow.filter("v <> winsorized").count()
    n_wide = wide.filter("v <> winsorized").count()
    assert n_wide < n_narrow
    moved = narrow.filter("v <> winsorized")
    assert moved.filter(
        "abs(winsorized) > abs(v) + 1e-9"
    ).count() == 0  # clamping never moves a value outward


def test_snapshot_diff_self_is_all_unchanged_and_symmetry(spark):
    from census_data_pipeline_spark.operators.change import snapshot_diff

    df = spark.createDataFrame(
        [(i, float(i % 13), str(i % 7)) for i in range(300)],
        "k long, v double, s string",
    )
    self_diff = snapshot_diff(df, df, ["k"])
    assert self_diff.filter("change_type <> 'unchanged'").count() == 0
    other = df.filter("k % 3 <> 0")
    ab = {r.k: r.change_type
          for r in snapshot_diff(df, other, ["k"]).collect()}
    ba = {r.k: r.change_type
          for r in snapshot_diff(other, df, ["k"]).collect()}
    # removed in one direction <=> added in the other
    assert {k for k, t in ab.items() if t == "removed"} == \
           {k for k, t in ba.items() if t == "added"}


def test_ks_symmetric(spark):
    import random

    from census_data_pipeline_spark.operators.drift import ks_statistic

    rng = random.Random(9)
    a = spark.createDataFrame([(rng.uniform(0, 10),) for _ in range(300)],
                              "v double")
    b = spark.createDataFrame([(rng.uniform(2, 12),) for _ in range(200)],
                              "v double")
    ab = ks_statistic(a, b, "v").first().ks_stat
    ba = ks_statistic(b, a, "v").first().ks_stat
    assert ab == ba and 0 < ab < 1


def test_semantic_dedup_threshold_monotone(spark):
    """Raising the threshold can only ADD survivors (fewer pairs)."""
    import random

    from census_data_pipeline_spark.functions.similarity import semantic_dedup

    rng = random.Random(4)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept_lo = {r.id for r in
               semantic_dedup(df, threshold=0.5, n_centroids=4).collect()
               if r.kept}
    kept_hi = {r.id for r in
               semantic_dedup(df, threshold=0.9, n_centroids=4).collect()
               if r.kept}
    assert kept_lo <= kept_hi


# -- argument validation --------------------------------------------------
def test_new_operators_reject_bad_arguments(spark):
    from census_data_pipeline_spark.functions.sampling import (
        target_encode,
        weighted_sample,
    )
    from census_data_pipeline_spark.functions.similarity import semantic_dedup
    from census_data_pipeline_spark.operators.bloom import optimal_params
    from census_data_pipeline_spark.operators.drift import psi
    from census_data_pipeline_spark.operators.skyline import skyline_2d
    from census_data_pipeline_spark.sources.bucketing import compact_files

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    emb = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        weighted_sample(df, "id", "v", k=0)
    with pytest.raises(ValueError):
        target_encode(df, "id", "v", alpha=-1.0)
    with pytest.raises(ValueError):
        semantic_dedup(emb, n_centroids=0)
    with pytest.raises(ValueError):
        optimal_params(0, 0.01)
    with pytest.raises(ValueError):
        optimal_params(10, 1.5)
    with pytest.raises(ValueError):
        psi(df, df, "v", n_bins=1)
    with pytest.raises(ValueError):
        skyline_2d(df, "id", "v", n_buckets=0)
    with pytest.raises(ValueError):
        compact_files(spark, "/nonexistent", target_file_bytes=0)


# -- cross-corpus dedup --------------------------------------------------
def test_dedup_against_reference_no_self_pairs(spark):
    from census_data_pipeline_spark.functions.dedup import (
        minhash_dedup_against,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    ref = spark.createDataFrame(
        [(100, shared), (101, "completely different reference text here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, shared),                      # duplicate of ref 100
         (2, "brand new unrelated words entirely"),
         (3, "brand new unrelated words entirely")],  # dup of ANOTHER new
        "doc_id long, text string",
    )
    out = {r.id: (r.ref_id, r.jaccard) for r in minhash_dedup_against(
        new, ref, n=3, threshold=0.5).collect()}
    assert out[1] == (100, 1.0)   # flagged against the reference
    assert 2 not in out and 3 not in out  # new-vs-new pairs NOT flagged


def test_dedup_against_reference_bucket_cap_adversarial(spark):
    """SCALING.md 'Cross-corpus LSH cap' (VERDICT r4 #2): a mega-cluster
    in the curated reference colliding with a duplicate-heavy crawl
    batch would emit r×b candidates per bucket. bucket_cap keeps the 8
    lowest ref ids per (band, bucket) — candidates drop to 8×b (linear
    in batch size) — while flag-recall is PRESERVED: every new dup still
    matches a capped survivor, and the non-identical near-dup pair in a
    small bucket is untouched. new_bucket_cap is the explicit opt-in
    that trades recall (un-flags capped-away new rows) for a bound on a
    pathological un-deduped batch."""
    from census_data_pipeline_spark.functions.dedup import (
        _cap_buckets,
        _minhash_band_frame,
        minhash_dedup_against,
    )
    import pyspark.sql.functions as F

    mega = "dup dup text common words here now"
    ref = spark.createDataFrame(
        [(100 + i, mega) for i in range(60)]          # ref mega-cluster
        + [(900, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),    # near-dup target
           (901, "totally unrelated reference words")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, mega) for i in range(1, 41)]             # duplicate-heavy batch
        + [(50, "w0 w1 w2 w3 w4 w5 w6 w7 w8 zz"),     # near-dup of 900
           (60, "brand new words nothing shared")],
        "doc_id long, text string",
    )

    # the cap bounds the ref band frame itself: <= 8 rows per (band, bucket)
    capped_bands = _cap_buckets(
        _minhash_band_frame(ref, "doc_id", "text", 8, 2, 3), 8
    )
    per_bucket = capped_bands.groupBy("band", "bucket").count()
    assert per_bucket.agg(F.max("count")).first()[0] <= 8
    # so cross-join candidates are <= 8 x |new bucket| instead of 60 x 40

    uncapped = {r.id: (r.ref_id, r.jaccard) for r in minhash_dedup_against(
        new, ref, n=3, threshold=0.5).collect()}
    capped = {r.id: (r.ref_id, r.jaccard) for r in minhash_dedup_against(
        new, ref, n=3, threshold=0.5, bucket_cap=8).collect()}
    # recall preserved exactly: all 40 dups flagged (best ref = lowest id
    # 100 survives any cap), near-dup 50 -> 900 flagged, 60 clean
    assert capped == uncapped
    assert set(capped) == set(range(1, 41)) | {50}
    assert all(capped[i] == (100, 1.0) for i in range(1, 41))
    assert capped[50][0] == 900 and 0.5 <= capped[50][1] < 1.0

    # new_bucket_cap is the documented recall trade: only the 8 lowest
    # new ids in the mega-bucket keep their flags; the near-dup (small
    # bucket) is unaffected
    both = {r.id for r in minhash_dedup_against(
        new, ref, n=3, threshold=0.5, bucket_cap=8, new_bucket_cap=8
    ).collect()}
    assert both == set(range(1, 9)) | {50}


# -- equi-depth histogram -------------------------------------------------
def test_equidepth_histogram_balanced_and_total(spark):
    from census_data_pipeline_spark.operators.drift import equidepth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(1000)], "v double")
    out = {r.bin: r for r in equidepth_histogram(df, "v", 10).collect()}
    assert len(out) == 10
    assert sum(r.n for r in out.values()) == 1000
    assert all(90 <= r.n <= 110 for r in out.values())  # ~equal depth
    # buckets tile the range in order with no overlap
    bins = [out[i] for i in sorted(out)]
    for a, b in zip(bins, bins[1:]):
        assert a.hi < b.lo or a.hi <= b.lo
    assert bins[0].lo == 0.0 and bins[-1].hi == 999.0


def test_equidepth_histogram_approx_mode_balanced(spark):
    """VERDICT r4 #3: approx=True swaps the exact single-buffer
    percentile for the mergeable percentile_approx sketch. Buckets must
    stay (1-eps)-balanced (rank error <= n/accuracy -> here exact-rank,
    so allow the same tolerance band as exact), tile the range, and
    cover every row; exact mode is unchanged."""
    from census_data_pipeline_spark.operators.drift import equidepth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(1000)], "v double")
    out = {r.bin: r for r in
           equidepth_histogram(df, "v", 10, approx=True).collect()}
    assert len(out) == 10
    assert sum(r.n for r in out.values()) == 1000
    # accuracy=10000 over 1000 rows -> rank error <= 1 row per edge
    assert all(90 <= r.n <= 110 for r in out.values())
    bins = [out[i] for i in sorted(out)]
    for a, b in zip(bins, bins[1:]):
        assert a.hi <= b.lo
    assert bins[0].lo == 0.0 and bins[-1].hi == 999.0

    # exact mode still produces the identical result it always did
    exact = {(r.bin, r.n) for r in equidepth_histogram(df, "v", 10).collect()}
    assert exact == {(i + 1, 100) for i in range(10)}


def test_equidepth_histogram_excludes_nulls_and_validates(spark):
    from census_data_pipeline_spark.operators.drift import equidepth_histogram

    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (3.0,), (4.0,)], "v double"
    )
    out = equidepth_histogram(df, "v", 2).collect()
    assert sum(r.n for r in out) == 4  # the NULL is not bucketed
    with pytest.raises(ValueError):
        equidepth_histogram(df, "v", 1)

"""Round-10c operators: one-way ANOVA + Bartlett variance homogeneity
(the parametric partners of the Kruskal–Wallis / Mann–Whitney rank
family), and the rest of this session's analytics additions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

# --- one-way ANOVA ------------------------------------------------------


def _anova_df(spark):
    rows = (
        [("g", "A", v) for v in (1.0, 2.0, 3.0)]
        + [("g", "B", v) for v in (2.0, 4.0, 6.0)]
        + [("g", "C", v) for v in (5.0, 5.0, 8.0)]
    )
    return spark.createDataFrame(rows, "grp string, coh string, v double")


def test_anova_hand_computed(spark):
    """A=[1,2,3] B=[2,4,6] C=[5,5,8]: SSB = 24, SSW = 16,
    F = (24/2)/(16/6) = 4.5; (k−1)F = 9 > χ²(2) cut 5.99 →
    significant."""
    from census_data_pipeline_spark.operators.rollup import oneway_anova

    got = oneway_anova(_anova_df(spark), ["grp"], "coh", "v").collect()
    assert len(got) == 1
    r = got[0]
    assert r.n == 9 and r.k == 3 and r.dof == 2
    assert r.ss_between == pytest.approx(24.0, abs=1e-6)
    assert r.ss_within == pytest.approx(16.0, abs=1e-6)
    assert r.f_stat == pytest.approx(4.5, abs=1e-6)
    assert r.significant_95 is True


def test_anova_single_cohort_null(spark):
    from census_data_pipeline_spark.operators.rollup import oneway_anova

    df = spark.createDataFrame(
        [("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 3.0)],
        "grp string, coh string, v double",
    )
    r = oneway_anova(df, ["grp"], "coh", "v").collect()[0]
    assert r.k == 1 and r.dof == 0
    assert r.f_stat is None and r.significant_95 is None


def test_anova_zero_within_variance_null(spark):
    """All values tie within every cohort → SSW = 0, F undefined →
    NULL (not infinity)."""
    from census_data_pipeline_spark.operators.rollup import oneway_anova

    df = spark.createDataFrame(
        [("g", "A", 1.0), ("g", "A", 1.0),
         ("g", "B", 9.0), ("g", "B", 9.0)],
        "grp string, coh string, v double",
    )
    r = oneway_anova(df, ["grp"], "coh", "v").collect()[0]
    assert r.ss_within == pytest.approx(0.0, abs=1e-9)
    assert r.f_stat is None and r.significant_95 is None


# --- Bartlett variance homogeneity --------------------------------------


def test_bartlett_hand_computed(spark):
    """A=[1,2,3,4] (s²=5/3), B=[2,4,6,8] (s²=20/3): pooled = 25/6,
    C = 1 + (2/3 − 1/6)/3, T = [6·ln(25/6) − 3·ln(5/3) − 3·ln(20/3)]/C
    ≈ 1.147595 — under the χ²(1) cut (not significant)."""
    from census_data_pipeline_spark.operators.rollup import bartlett_test

    rows = [("g", "A", v) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("g", "B", v) for v in (2.0, 4.0, 6.0, 8.0)
    ]
    df = spark.createDataFrame(rows, "grp string, coh string, v double")
    r = bartlett_test(df, ["grp"], "coh", "v").collect()[0]
    pooled = 25.0 / 6.0
    c = 1.0 + (2.0 / 3.0 - 1.0 / 6.0) / 3.0
    t = (6.0 * math.log(pooled)
         - 3.0 * math.log(5.0 / 3.0)
         - 3.0 * math.log(20.0 / 3.0)) / c
    assert r.n == 8 and r.k == 2 and r.dof == 1
    assert r.pooled_var == pytest.approx(round(pooled, 6), abs=1e-6)
    assert r.t_stat == pytest.approx(round(t, 6), abs=1e-6)
    assert r.significant_95 is False


def test_bartlett_excludes_singleton_cohorts(spark):
    """A cohort with one row carries no variance → excluded; k counts
    only usable cohorts."""
    from census_data_pipeline_spark.operators.rollup import bartlett_test

    rows = (
        [("g", "A", v) for v in (1.0, 2.0, 3.0)]
        + [("g", "B", v) for v in (2.0, 5.0, 9.0)]
        + [("g", "solo", 7.0)]
    )
    df = spark.createDataFrame(rows, "grp string, coh string, v double")
    r = bartlett_test(df, ["grp"], "coh", "v").collect()[0]
    assert r.k == 2 and r.n == 6
    assert r.t_stat is not None


def test_bartlett_zero_variance_cohort_null(spark):
    """A constant cohort has s² = 0 → ln undefined → NULL statistic,
    but pooled_var still reports."""
    from census_data_pipeline_spark.operators.rollup import bartlett_test

    rows = [("g", "A", 5.0), ("g", "A", 5.0)] + [
        ("g", "B", v) for v in (1.0, 2.0, 3.0)
    ]
    df = spark.createDataFrame(rows, "grp string, coh string, v double")
    r = bartlett_test(df, ["grp"], "coh", "v").collect()[0]
    assert r.t_stat is None and r.significant_95 is None
    assert r.pooled_var is not None


# --- exact two-sample 1-Wasserstein --------------------------------------


def test_wasserstein_point_masses(spark):
    from census_data_pipeline_spark.operators.drift import wasserstein_1

    a = spark.createDataFrame([(0.0,)], "v double")
    b = spark.createDataFrame([(1.0,)], "v double")
    r = wasserstein_1(a, b, "v").collect()[0]
    assert r.w1_distance == pytest.approx(1.0, abs=1e-9)
    assert (r.n_a, r.n_b) == (1, 1)


def test_wasserstein_hand_computed(spark):
    """A=[0,1], B=[0.5,1.5]: segments .5·|.5−0| + .5·|.5−.5| +
    .5·|1−.5| = 0.5 — and a pure shift of c moves W1 by exactly c."""
    from census_data_pipeline_spark.operators.drift import wasserstein_1

    a = spark.createDataFrame([(0.0,), (1.0,)], "v double")
    b = spark.createDataFrame([(0.5,), (1.5,)], "v double")
    assert wasserstein_1(a, b, "v").collect()[0].w1_distance == (
        pytest.approx(0.5, abs=1e-9)
    )
    a3 = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    b3 = spark.createDataFrame([(3.0,), (4.0,), (5.0,)], "v double")
    assert wasserstein_1(a3, b3, "v").collect()[0].w1_distance == (
        pytest.approx(2.0, abs=1e-9)
    )


def test_wasserstein_identical_and_empty(spark):
    from census_data_pipeline_spark.operators.drift import wasserstein_1

    a = spark.createDataFrame([(2.0,), (2.0,), (7.0,)], "v double")
    assert wasserstein_1(a, a, "v").collect()[0].w1_distance == 0.0
    empty = spark.createDataFrame([], "v double")
    r = wasserstein_1(a, empty, "v").collect()[0]
    assert r.w1_distance is None and r.n_b == 0


# --- Cramér's V ----------------------------------------------------------


def test_cramers_v_perfect_association(spark):
    """Diagonal 2×2 (a always pairs with x, b with y): χ² = n,
    V = 1 → 'large'."""
    from census_data_pipeline_spark.operators.rollup import cramers_v

    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.cramers_v == pytest.approx(1.0, abs=1e-9)
    assert r.effect == "large" and r.chi2 == pytest.approx(10.0)


def test_cramers_v_independent_zero(spark):
    """Uniform 2×2 product table: χ² = 0, V = 0 → 'negligible'."""
    from census_data_pipeline_spark.operators.rollup import cramers_v

    rows = [(u, w) for u in ("a", "b") for w in ("x", "y")] * 3
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.cramers_v == 0.0 and r.effect == "negligible"


def test_cramers_v_constant_column_null(spark):
    from census_data_pipeline_spark.operators.rollup import cramers_v

    rows = [("a", "x"), ("a", "y"), ("a", "x")]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.cramers_v is None and r.effect is None


# --- Kendall τ-b ---------------------------------------------------------


def test_kendall_perfect_and_inverse(spark):
    from census_data_pipeline_spark.operators.rollup import kendall_tau

    up = spark.createDataFrame(
        [("g", float(i), float(i * i)) for i in range(1, 7)],
        "grp string, x double, y double",
    )
    r = kendall_tau(up, ["grp"], "x", "y").collect()[0]
    assert r.tau_b == pytest.approx(1.0) and r.significant_95 is True
    down = spark.createDataFrame(
        [("g", float(i), float(-i)) for i in range(1, 7)],
        "grp string, x double, y double",
    )
    assert kendall_tau(down, ["grp"], "x", "y").collect()[0].tau_b == (
        pytest.approx(-1.0)
    )


def test_kendall_hand_computed(spark):
    """x=[1,2,3,4], y=[1,3,2,4]: C=5, D=1, no ties → τ = 4/6."""
    from census_data_pipeline_spark.operators.rollup import kendall_tau

    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 3.0), ("g", 3.0, 2.0),
         ("g", 4.0, 4.0)],
        "grp string, x double, y double",
    )
    r = kendall_tau(df, ["grp"], "x", "y").collect()[0]
    assert (r.concordant, r.discordant, r.n_pairs) == (5, 1, 6)
    assert r.tau_b == pytest.approx(round(4.0 / 6.0, 6), abs=1e-6)


def test_kendall_tie_corrected(spark):
    """x=[1,1,2,2], y=[1,2,1,2]: C=D=1, n1=n2=2 → τ-b = 0 with the
    tie-shrunk denominator 4 (not n0=6)."""
    from census_data_pipeline_spark.operators.rollup import kendall_tau

    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 1.0),
         ("g", 2.0, 2.0)],
        "grp string, x double, y double",
    )
    r = kendall_tau(df, ["grp"], "x", "y").collect()[0]
    assert (r.concordant, r.discordant) == (1, 1)
    assert r.tau_b == pytest.approx(0.0)


def test_kendall_constant_y_null(spark):
    from census_data_pipeline_spark.operators.rollup import kendall_tau

    df = spark.createDataFrame(
        [("g", float(i), 5.0) for i in range(4)],
        "grp string, x double, y double",
    )
    r = kendall_tau(df, ["grp"], "x", "y").collect()[0]
    assert r.tau_b is None and r.z_stat is None


# --- cross-correlation ---------------------------------------------------


_SPIKY = [0.0, 1.0, 0.0, 0.0, 5.0, 2.0, 0.0, 7.0, 1.0, 0.0, 3.0, 0.0]


def test_ccf_recovers_known_shift(spark):
    """b_t = a_{t−2} (B lags A by 2 hours) → ccf = 1.0 exactly at
    lag +2 and that row is flagged best."""
    from census_data_pipeline_spark.operators.forecast import (
        cross_correlation,
    )

    a = spark.createDataFrame(
        [(t, v) for t, v in enumerate(_SPIKY)], "t long, y double"
    )
    b = spark.createDataFrame(
        [(t + 2, v) for t, v in enumerate(_SPIKY)], "t long, y double"
    )
    rows = {r.lag: r for r in
            cross_correlation(a, b, "t", "y", max_lag=3).collect()}
    assert len(rows) == 7
    assert rows[2].ccf == pytest.approx(1.0)
    assert rows[2].best is True
    assert all(not r.best for lag, r in rows.items()
               if lag != 2 and r.best is not None)


def test_ccf_no_overlap_and_guard(spark):
    from census_data_pipeline_spark.operators.forecast import (
        cross_correlation,
    )

    a = spark.createDataFrame([(0, 1.0), (1, 2.0)], "t long, y double")
    b = spark.createDataFrame([(10, 1.0), (11, 2.0)], "t long, y double")
    rows = cross_correlation(a, b, "t", "y", max_lag=2).collect()
    assert all(r.ccf is None and r.n == 0 for r in rows)
    with pytest.raises(ValueError):
        cross_correlation(a, b, "t", "y", max_lag=0)


# --- binned-Lorenz Gini --------------------------------------------------


def test_gini_ordering_and_extremes(spark):
    """All-equal → exactly 0; one whale among zeros → near 1; and a
    concentrated group scores strictly above an even one."""
    from census_data_pipeline_spark.operators.rollup import gini_binned

    rows = (
        [("equal", 10.0)] * 8
        + [("whale", 0.0)] * 9 + [("whale", 1000.0)]
        + [("spread", float(v)) for v in (8, 9, 10, 11, 12)]
        + [("skew", float(v)) for v in (1, 1, 1, 1, 100)]
    )
    df = spark.createDataFrame(rows, "grp string, v double")
    g = {r.grp: r for r in
         gini_binned(df, ["grp"], "v", n_bins=64).collect()}
    assert g["equal"].gini == 0.0 and g["equal"].bins_used == 1
    assert g["whale"].gini == pytest.approx(0.9, abs=1e-6)
    assert g["skew"].gini > g["spread"].gini > 0.0


def test_gini_negative_excluded_and_guard(spark):
    from census_data_pipeline_spark.operators.rollup import gini_binned

    df = spark.createDataFrame(
        [("g", -5.0), ("g", 4.0), ("g", 4.0)], "grp string, v double"
    )
    r = gini_binned(df, ["grp"], "v").collect()[0]
    assert r.n == 2 and r.gini == 0.0
    with pytest.raises(ValueError):
        gini_binned(df, ["grp"], "v", n_bins=1)


def test_gini_zero_total_null(spark):
    from census_data_pipeline_spark.operators.rollup import gini_binned

    df = spark.createDataFrame([("g", 0.0), ("g", 0.0)],
                               "grp string, v double")
    assert gini_binned(df, ["grp"], "v").collect()[0].gini is None


# --- concentration metrics -----------------------------------------------


def test_concentration_monopoly_and_even(spark):
    """One key owning everything → HHI 1, entropy 0, effective 1;
    four even keys → HHI 0.25, entropy ln4, effective 4."""
    from census_data_pipeline_spark.operators.rollup import (
        concentration_metrics,
    )

    rows = [("mono", "k1", 10.0), ("mono", "k1", 5.0)] + [
        ("even", f"k{i}", 3.0) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "grp string, k string, v double")
    got = {r.grp: r for r in
           concentration_metrics(df, ["grp"], "k", "v").collect()}
    assert got["mono"].hhi == 1.0
    assert got["mono"].shannon_entropy == 0.0
    assert got["mono"].effective_keys == 1.0
    assert got["even"].hhi == pytest.approx(0.25)
    assert got["even"].shannon_entropy == pytest.approx(
        round(math.log(4.0), 6)
    )
    assert got["even"].effective_keys == pytest.approx(4.0, abs=1e-5)


def test_concentration_nonpositive_keys_excluded(spark):
    from census_data_pipeline_spark.operators.rollup import (
        concentration_metrics,
    )

    rows = [("g", "a", 6.0), ("g", "b", 6.0), ("g", "zero", 0.0),
            ("g", "neg", -3.0)]
    df = spark.createDataFrame(rows, "grp string, k string, v double")
    r = concentration_metrics(df, ["grp"], "k", "v").collect()[0]
    assert r.n_keys == 2 and r.hhi == pytest.approx(0.5)


# --- connected components -------------------------------------------------


def test_components_two_cliques_and_pair(spark):
    from census_data_pipeline_spark.functions import graph

    k3 = [("a1", "a2"), ("a2", "a3"), ("a3", "a1")]
    k2 = [("b1", "b2"), ("b2", "b3")]
    pair = [("z8", "z9")]
    df = spark.createDataFrame(k3 + k2 + pair, "src string, dst string")
    got = {r.id: r.component
           for r in graph.connected_components(df).collect()}
    assert got == {"a1": "a1", "a2": "a1", "a3": "a1",
                   "b1": "b1", "b2": "b1", "b3": "b1",
                   "z8": "z8", "z9": "z8"}


def test_components_path_needs_propagation(spark):
    """A 6-node path: the min label must travel the full diameter."""
    from census_data_pipeline_spark.functions import graph

    path = [(f"n{i}", f"n{i + 1}") for i in range(1, 6)]
    df = spark.createDataFrame(path, "src string, dst string")
    got = {r.component for r in graph.connected_components(df).collect()}
    assert got == {"n1"}


def test_components_self_loops_duplicates_and_cap(spark):
    from census_data_pipeline_spark.functions import graph

    df = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x"), ("x", "y")],
        "src string, dst string",
    )
    got = {r.id: r.component
           for r in graph.connected_components(df).collect()}
    assert got == {"x": "x", "y": "x"}
    with pytest.raises(RuntimeError):
        graph.connected_components(df, max_rounds=0)


# --- new vs returning -----------------------------------------------------


def test_new_vs_returning_hand_case(spark):
    from census_data_pipeline_spark.operators.rollup import (
        new_vs_returning,
    )

    rows = [
        ("2024-01-01 03:00:00", 1), ("2024-01-01 05:00:00", 1),
        ("2024-01-02 09:00:00", 1), ("2024-01-02 10:00:00", 2),
        ("2024-01-04 01:00:00", 2),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )
    got = {r.bucket.day: r for r in
           new_vs_returning(df, "ts", "user_id").collect()}
    assert (got[1].active_users, got[1].new_users,
            got[1].returning_users, got[1].cumulative_users) == (1, 1, 0, 1)
    assert (got[2].active_users, got[2].new_users,
            got[2].returning_users, got[2].cumulative_users) == (2, 1, 1, 2)
    assert (got[4].active_users, got[4].new_users,
            got[4].returning_users, got[4].cumulative_users) == (1, 0, 1, 2)
    assert 3 not in got  # empty buckets don't appear


def test_new_vs_returning_null_user_dropped(spark):
    from census_data_pipeline_spark.operators.rollup import (
        new_vs_returning,
    )

    df = spark.createDataFrame(
        [("2024-01-01 03:00:00", 7), ("2024-01-01 04:00:00", None)],
        "ts string, user_id long",
    ).select(F.to_timestamp("ts").alias("ts"), "user_id")
    rows = new_vs_returning(df, "ts", "user_id").collect()
    assert len(rows) == 1 and rows[0].active_users == 1


# --- session paths ---------------------------------------------------------


def test_session_paths_hand_case(spark):
    """u1: three events within 5m → one session 'a>b>c'; then a 10m
    gap opens a second session 'a'. u2: one session 'b>a'."""
    from census_data_pipeline_spark.operators.attribution import (
        session_paths,
    )

    rows = [
        (1, "2024-01-01 10:00:00", "a"),
        (1, "2024-01-01 10:01:00", "b"),
        (1, "2024-01-01 10:02:00", "c"),
        (1, "2024-01-01 10:12:00", "a"),
        (2, "2024-01-01 10:00:00", "b"),
        (2, "2024-01-01 10:03:00", "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    got = {(r.path, r.n_sessions) for r in
           session_paths(df, "ts", "user_id", "event_type").collect()}
    assert got == {("a>b>c", 1), ("a", 1), ("b>a", 1)}


def test_session_paths_depth_and_topk(spark):
    """depth=2 truncates openings; k=1 keeps only the modal path under
    the (count DESC, path ASC) total order."""
    from census_data_pipeline_spark.operators.attribution import (
        session_paths,
    )

    rows = []
    for u in range(3):
        rows += [(u, f"2024-01-01 10:0{i}:00", t)
                 for i, t in enumerate(("x", "y", "z"))]
    rows.append((9, "2024-01-01 10:00:00", "x"))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    top = session_paths(df, "ts", "user_id", "event_type",
                        depth=2, k=1).collect()
    assert [(r.path, r.n_sessions) for r in top] == [("x>y", 3)]


# --- readability -----------------------------------------------------------


def test_readability_hand_computed(spark):
    """'the cat sat.' → 3 words, 1 sentence, 3 vowel groups:
    flesch = 206.835 − 1.015·3 − 84.6·1 = 119.19 → very_easy."""
    from census_data_pipeline_spark.functions.text import (
        readability_scores,
    )

    df = spark.createDataFrame([(1, "the cat sat.")],
                               "doc_id long, text string")
    r = readability_scores(df, "text", "doc_id").collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 3)
    assert r.flesch == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1,
                                     abs=1e-6)
    assert r.band == "very_easy"


def test_readability_ordering_and_clamp(spark):
    """Dense polysyllabic prose scores below simple prose; a
    terminator-free doc clamps to 1 sentence instead of dividing by
    zero."""
    from census_data_pipeline_spark.functions.text import (
        readability_scores,
    )

    df = spark.createDataFrame(
        [(1, "we go. we run. it is fun."),
         (2, "extraordinarily sophisticated epistemological "
             "contemplations necessitate uninterrupted concentration"),
         (3, "no terminator here at all")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           readability_scores(df, "text", "doc_id").collect()}
    assert got[1].flesch > got[2].flesch
    assert got[3].n_sentences == 1
    assert got[2].band == "very_difficult"


# --- SQ8 quantization ------------------------------------------------------


def test_sq8_exact_endpoints_and_constant_dim(spark):
    """Endpoint values encode losslessly (codes 0 and 255); a constant
    dimension reports zero error; a midpoint value carries the
    half-step error 0.5/255·range."""
    from census_data_pipeline_spark.functions.similarity import (
        quantize_sq8,
    )

    rows = [(1, [0.0, 7.0, 0.0]), (2, [1.0, 7.0, 0.5]),
            (3, [0.0, 7.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.pos: r for r in quantize_sq8(df, "embedding").collect()}
    assert got[0].mse == 0.0 and got[0].max_abs_err == 0.0
    assert got[1].mse == 0.0 and got[1].rmse_vs_range == 0.0
    assert got[2].max_abs_err == pytest.approx(
        abs(0.5 - round(0.5 * 255) / 255), abs=1e-6
    )


def test_sq8_uniform_grid_hits_quantization_floor(spark):
    """A fine uniform grid reconstructs within the step/√12 noise
    floor: rmse_vs_range must land near 1/(255·√12) ≈ 0.00113."""
    from census_data_pipeline_spark.functions.similarity import (
        quantize_sq8,
    )

    rows = [(i, [i / 999.0]) for i in range(1000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = quantize_sq8(df, "embedding").collect()[0]
    floor_ = 1.0 / (255.0 * math.sqrt(12.0))
    assert r.rmse_vs_range == pytest.approx(floor_, rel=0.15)


# --- Markov stationary -----------------------------------------------------


def _chain_df(spark, bigrams):
    rows = []
    uid = 0
    for (s, j), n in bigrams.items():
        for _ in range(n):
            rows.append((uid, "2024-01-01 10:00:00", 2 * uid, s))
            rows.append((uid, "2024-01-01 10:01:00", 2 * uid + 1, j))
            uid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    )
    return df.select("user_id", F.to_timestamp("ts").alias("ts"),
                     "event_id", "event_type")


def test_markov_stationary_planted_chain(spark):
    """P = [[.9,.1],[.5,.5]] has stationary (5/6, 1/6); 30 rounded
    power steps from uniform land within a 6-dp ulp of it."""
    from census_data_pipeline_spark.operators.rollup import (
        markov_stationary,
    )

    df = _chain_df(spark, {("a", "a"): 9, ("a", "b"): 1,
                           ("b", "a"): 5, ("b", "b"): 5})
    got = {r.event_type: r.stationary_prob for r in
           markov_stationary(df, "ts", "user_id", "event_type",
                             "event_id").collect()}
    assert got["a"] == pytest.approx(5.0 / 6.0, abs=1e-5)
    assert got["b"] == pytest.approx(1.0 / 6.0, abs=1e-5)


def test_markov_sink_only_type_renormalized(spark):
    """'c' never transitions OUT → it is not a state; edges into it
    drop and the surviving rows renormalize, so π still sums to 1."""
    from census_data_pipeline_spark.operators.rollup import (
        markov_stationary,
    )

    df = _chain_df(spark, {("a", "a"): 2, ("a", "b"): 1, ("a", "c"): 1,
                           ("b", "a"): 1})
    rows = markov_stationary(df, "ts", "user_id", "event_type",
                             "event_id").collect()
    types = {r.event_type for r in rows}
    assert types == {"a", "b"}
    assert sum(r.stationary_prob for r in rows) == pytest.approx(
        1.0, abs=1e-4
    )


# --- bootstrap CI -----------------------------------------------------------


def test_bootstrap_detects_planted_separation(spark):
    """A ≈ 110, B ≈ 10: the 95% CI must sit strictly above zero and
    bracket the observed ~100 difference."""
    from census_data_pipeline_spark.operators.rollup import (
        bootstrap_mean_diff,
    )

    rows = [(i, True, 110.0 + (i % 5)) for i in range(20)] + [
        (100 + i, False, 10.0 + (i % 5)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, c boolean, v double")
    r = bootstrap_mean_diff(df, "id", F.col("c"), "v",
                            n_boot=100).collect()[0]
    assert r.n_a == 20 and r.n_b == 20
    assert r.excludes_zero is True and r.ci_lo > 50.0
    assert r.ci_lo <= r.observed_diff <= r.ci_hi


def test_bootstrap_null_effect_straddles_zero(spark):
    from census_data_pipeline_spark.operators.rollup import (
        bootstrap_mean_diff,
    )

    rows = [(i, i % 2 == 0, float(10 + i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, c boolean, v double")
    r = bootstrap_mean_diff(df, "id", F.col("c"), "v",
                            n_boot=100).collect()[0]
    assert r.excludes_zero is False
    assert r.ci_lo < 0.0 < r.ci_hi


def test_bootstrap_is_deterministic(spark):
    from census_data_pipeline_spark.operators.rollup import (
        bootstrap_mean_diff,
    )

    rows = [(i, i % 2 == 0, float(i % 11)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, c boolean, v double")
    a = bootstrap_mean_diff(df, "id", F.col("c"), "v",
                            n_boot=50).collect()[0]
    b = bootstrap_mean_diff(df, "id", F.col("c"), "v",
                            n_boot=50).collect()[0]
    assert tuple(a) == tuple(b)
    assert a.n_boot_effective <= 50


# --- decayed value top-k -----------------------------------------------------


def test_decayed_value_recency_beats_size(spark):
    """u1: 100 at the horizon (weight 1); u2: 150 one half-life back
    (weight 0.5 → 75): u1 must rank first even with less raw spend."""
    from census_data_pipeline_spark.operators.rollup import (
        decayed_value_topk,
    )

    rows = [(1, "2024-01-08 00:00:00", 100.0),
            (2, "2024-01-01 00:00:00", 150.0)]
    df = spark.createDataFrame(rows, "user_id long, ts string, v double") \
        .select("user_id", F.to_timestamp("ts").alias("ts"), "v")
    got = decayed_value_topk(df, "ts", "user_id", "v",
                             half_life_hours=168.0, k=5).collect()
    assert [r.user_id for r in got] == [1, 2]
    assert got[0].decayed_value == pytest.approx(100.0, abs=1e-6)
    assert got[1].decayed_value == pytest.approx(75.0, abs=1e-6)
    assert got[1].raw_value == pytest.approx(150.0, abs=1e-6)


def test_decayed_value_k_and_tiebreak(spark):
    from census_data_pipeline_spark.operators.rollup import (
        decayed_value_topk,
    )

    rows = [(u, "2024-01-08 00:00:00", 10.0) for u in (5, 3, 9, 1)]
    df = spark.createDataFrame(rows, "user_id long, ts string, v double") \
        .select("user_id", F.to_timestamp("ts").alias("ts"), "v")
    got = decayed_value_topk(df, "ts", "user_id", "v", k=3).collect()
    assert [r.user_id for r in got] == [1, 3, 5]  # ties → key ASC, k=3


# --- dow × hour profile ------------------------------------------------------


def test_dow_hour_profile_hand_grid(spark):
    """2024-01-01 is a Monday: 3 events Mon 10h + 1 event Tue 11h →
    shares .75/.25, z = ±1 (population std of {3,1} is 1)."""
    from census_data_pipeline_spark.operators.rollup import (
        dow_hour_profile,
    )

    rows = (["2024-01-01 10:05:00"] * 3) + ["2024-01-02 11:30:00"]
    df = spark.createDataFrame([(t,) for t in rows], "ts string") \
        .select(F.to_timestamp("ts").alias("ts"))
    got = {(r.iso_dow, r.hour): r for r in
           dow_hour_profile(df, "ts").collect()}
    assert set(got) == {(1, 10), (2, 11)}
    assert got[(1, 10)].n_events == 3
    assert got[(1, 10)].share == pytest.approx(0.75)
    assert got[(1, 10)].z_score == pytest.approx(1.0)
    assert got[(2, 11)].z_score == pytest.approx(-1.0)


def test_dow_hour_profile_constant_grid_null_z(spark):
    from census_data_pipeline_spark.operators.rollup import (
        dow_hour_profile,
    )

    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-02 11:00:00",)], "ts string"
    ).select(F.to_timestamp("ts").alias("ts"))
    rows = dow_hour_profile(df, "ts").collect()
    assert all(r.z_score is None for r in rows)
    assert all(r.share == 0.5 for r in rows)


# --- multi-column prefix sum -------------------------------------------------


def test_running_sums_scalable_equals_chained_single(spark):
    """One multi-column pass must be value-identical to chaining three
    single-column passes (grouped and ungrouped)."""
    from census_data_pipeline_spark.operators.prefixsum import (
        running_sum_scalable,
        running_sums_scalable,
    )

    rows = [(g, float(o), o % 3, (o * 7) % 5, 1)
            for g in ("a", "b") for o in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, o double, x long, "
                                     "y long, one long")

    def canon(frame):
        return sorted(
            (r.g, r.o, r.cx, r.cy, r.cone)
            for r in frame.select("g", "o", "cx", "cy", "cone").collect()
        )

    for groups in ([], ["g"]):
        multi = running_sums_scalable(
            df, "o", ["x", "y", "one"], ["cx", "cy", "cone"],
            group_cols=groups,
        )
        chained = running_sum_scalable(
            running_sum_scalable(
                running_sum_scalable(df, "o", "x", group_cols=groups,
                                     output_col="cx"),
                "o", "y", group_cols=groups, output_col="cy",
            ),
            "o", "one", group_cols=groups, output_col="cone",
        )
        assert canon(multi) == canon(chained), groups


def test_running_sums_scalable_guard(spark):
    from census_data_pipeline_spark.operators.prefixsum import (
        running_sums_scalable,
    )

    df = spark.createDataFrame([(1.0, 1)], "o double, x long")
    with pytest.raises(ValueError):
        running_sums_scalable(df, "o", ["x"], ["a", "b"])


# --- seasonal anomaly --------------------------------------------------------


def test_seasonal_anomaly_planted_spike(spark):
    """Five Mondays at 10:00 with counts {2,3,2,3,50}: the spike week
    must flag with a large positive z against its four peers (peers
    need nonzero variance — all-equal peers hit the var>0 guard)."""
    from census_data_pipeline_spark.operators.rollup import (
        seasonal_anomaly,
    )

    rows = []
    for wk, n in enumerate((2, 3, 2, 3, 50)):
        base = f"2024-01-{1 + 7 * wk:02d} 10:"
        rows += [(base + f"{i % 60:02d}:{i % 60:02d}",) for i in range(n)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.to_timestamp("ts").alias("ts")
    )
    out = seasonal_anomaly(df, "ts").collect()
    spikes = [r for r in out if r.is_anomaly and r.n_events == 50]
    assert len(spikes) == 1
    assert spikes[0].z_score > 3 and spikes[0].baseline_mean <= 3


def test_seasonal_anomaly_small_cells_unscored(spark):
    """Cells with fewer than 4 members (a 2-week corpus) are unscored
    — the m >= 4 guard."""
    from census_data_pipeline_spark.operators.rollup import (
        seasonal_anomaly,
    )

    rows = [("2024-01-01 10:00:00",), ("2024-01-08 10:30:00",)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.to_timestamp("ts").alias("ts")
    )
    out = seasonal_anomaly(df, "ts").collect()
    assert all(r.z_score is None for r in out)


# --- SQ8 recall --------------------------------------------------------------


def test_sq8_dequantize_roundtrip_bounds(spark):
    """Dequantized values stay within half a quantization step of the
    originals; endpoints reproduce exactly; constant dims pass
    through."""
    from census_data_pipeline_spark.functions.similarity import (
        sq8_dequantize,
    )

    rows = [(i, [i / 9.0, 5.0, -1.0 + 2 * i / 9.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.embedding for r in
           sq8_dequantize(df).collect()}
    for i in range(10):
        raw = [i / 9.0, 5.0, -1.0 + 2 * i / 9.0]
        for pos, (a, b) in enumerate(zip(raw, out[i])):
            step = (1.0, 0.0, 2.0)[pos] / 255.0
            assert abs(a - b) <= step / 2 + 1e-6, (i, pos)
    assert out[0][1] == pytest.approx(5.0)


def test_sq8_recall_perfect_on_separated_clusters(spark):
    """Well-separated clusters survive quantization: recall@k = 1 and
    rr = 1 for every query."""
    from census_data_pipeline_spark.functions.similarity import (
        sq8_knn_recall,
    )

    rows = []
    for c, center in enumerate(((10.0, 0.0), (0.0, 10.0), (-10.0, -10.0))):
        for j in range(6):
            rows.append((c * 10 + j,
                         [center[0] + j * 0.01, center[1] - j * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sq8_knn_recall(df, F.col("vec_id") % 10 == 0, k=3).collect()
    assert len(out) == 3
    assert all(r.recall_at_k == 1.0 and r.rr == 1.0 for r in out)


# --- Markov removal attribution ---------------------------------------------


def _journey_df(spark, journeys):
    """journeys: list of event-type sequences; each becomes one user
    with events 1 minute apart (single session)."""
    rows = []
    for u, seq in enumerate(journeys):
        for i, t in enumerate(seq):
            rows.append((u, f"2024-01-01 10:{i:02d}:00", i, t))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    )
    return df.select("user_id", F.to_timestamp("ts").alias("ts"),
                     "event_id", "event_type")


def test_markov_attribution_planted_causal_channel(spark):
    """Five a→purchase journeys and five b-only journeys: removing
    'a' kills every conversion (effect 1, share 1); removing 'b'
    changes nothing."""
    from census_data_pipeline_spark.operators.attribution import (
        markov_removal_attribution,
    )

    df = _journey_df(spark, [["a", "purchase"]] * 5 + [["b"]] * 5)
    got = {r.channel: r for r in markov_removal_attribution(
        df, "ts", "user_id", "event_type", "event_id", "purchase"
    ).collect()}
    assert got["a"].base_cvr == pytest.approx(0.5, abs=1e-5)
    assert got["a"].removed_cvr == pytest.approx(0.0, abs=1e-5)
    assert got["a"].removal_effect == pytest.approx(1.0, abs=1e-5)
    assert got["a"].attribution_share == pytest.approx(1.0, abs=1e-5)
    assert got["b"].removal_effect == pytest.approx(0.0, abs=1e-5)


def test_markov_attribution_zero_touch_conversion(spark):
    """A purchase-first session contributes start→conv directly: with
    one such session and one a→purchase session, base = 1.0 and
    removing 'a' halves it."""
    from census_data_pipeline_spark.operators.attribution import (
        markov_removal_attribution,
    )

    df = _journey_df(spark, [["purchase"], ["a", "purchase"]])
    got = {r.channel: r for r in markov_removal_attribution(
        df, "ts", "user_id", "event_type", "event_id", "purchase"
    ).collect()}
    assert got["a"].base_cvr == pytest.approx(1.0, abs=1e-5)
    assert got["a"].removed_cvr == pytest.approx(0.5, abs=1e-5)
    assert got["a"].removal_effect == pytest.approx(0.5, abs=1e-5)


def test_markov_attribution_two_step_path(spark):
    """a→b→purchase: both a and b sit on the only converting path, so
    removing either kills it — equal credit."""
    from census_data_pipeline_spark.operators.attribution import (
        markov_removal_attribution,
    )

    df = _journey_df(spark, [["a", "b", "purchase"]] * 3 + [["c"]] * 3)
    got = {r.channel: r for r in markov_removal_attribution(
        df, "ts", "user_id", "event_type", "event_id", "purchase"
    ).collect()}
    for ch in ("a", "b"):
        assert got[ch].removal_effect == pytest.approx(1.0, abs=1e-5)
        assert got[ch].attribution_share == pytest.approx(0.5, abs=1e-5)
    assert got["c"].removal_effect == pytest.approx(0.0, abs=1e-5)

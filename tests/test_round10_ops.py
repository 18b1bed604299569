"""Round-10 operators: full coreness decomposition (VERDICT r9 #1),
Newman modularity (#4), AR(p) Yule–Walker forecasting + MASE model
selection (#5), PR-AUC (#7), event-time stateful eviction (#3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

# --- full coreness decomposition ---------------------------------------


def test_coreness_planted_cores(spark):
    """K5 ∪ K4 bridged by a path, plus a pendant: coreness must be 4
    inside the 5-clique, 3 inside the 4-clique, 2 along the bridge (the
    whole bridged graph is its own 2-core — every node keeps degree
    ≥ 2), and 1 on the pendant tail."""
    from census_data_pipeline_spark.functions import graph

    k5 = [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
    k4 = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    path = [("a0", "p1"), ("p1", "p2"), ("p2", "b0")]
    pend = [("a1", "tail")]
    df = spark.createDataFrame(k5 + k4 + path + pend,
                               "src string, dst string")
    got = {r.id: r.coreness for r in graph.coreness(df).collect()}
    expect = {f"a{i}": 4 for i in range(5)}
    expect.update({f"b{i}": 3 for i in range(4)})
    expect.update({"p1": 2, "p2": 2, "tail": 1})
    assert got == expect


def test_coreness_consistent_with_kcore(spark):
    """{coreness ≥ k} must be exactly kcore_nodes(k)'s node set for every
    k up to the degeneracy (the defining property of core numbers)."""
    from census_data_pipeline_spark.functions import graph

    # wheel graph (hub + 8-cycle) plus a pendant: coreness hub/rim 3...
    # actually wheel rim nodes have degree 3, hub 8; 3-core = whole wheel.
    rim = [(f"r{i}", f"r{(i + 1) % 8}") for i in range(8)]
    spokes = [("hub", f"r{i}") for i in range(8)]
    pend = [("r0", "tail")]
    df = spark.createDataFrame(rim + spokes + pend,
                               "src string, dst string")
    core = {r.id: r.coreness for r in graph.coreness(df).collect()}
    assert max(core.values()) == 3
    for k in (1, 2, 3):
        want = {n for n, c in core.items() if c >= k}
        got = {r.id for r in graph.kcore_nodes(df, k=k, rounds=12)
               .collect()}
        assert got == want, k


def test_coreness_self_loops_and_duplicates_ignored(spark):
    """Self-loops and duplicate/reversed edges must not inflate degrees:
    a triangle listed redundantly still has coreness 2 everywhere."""
    from census_data_pipeline_spark.functions import graph

    edges = [("x", "y"), ("y", "x"), ("y", "z"), ("z", "x"),
             ("x", "x"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.coreness for r in graph.coreness(df).collect()}
    assert got == {"x": 2, "y": 2, "z": 2}


def test_coreness_matches_duckdb_oracle(spark, sf_dir):
    """The recursive-CTE oracle and the Spark peel agree on the
    customer–supplier graph (full value parity, not just counts)."""
    import duckdb

    from census_data_pipeline_spark.plans import ORACLE, QUERIES

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    want = dict(con.execute(ORACLE["graph_coreness"]).fetchall())
    got = {r.id: r.coreness
           for r in QUERIES["graph_coreness"](spark, sf_dir).collect()}
    assert got == want
    assert len(got) > 0

# --- Newman modularity --------------------------------------------------


def test_modularity_planted_two_cliques(spark):
    """Two K4s joined by one bridge, scored against the TRUE partition:
    S = 26, each community has s_c = 12, d_c = 13, so
    q_c = 12/26 - (13/26)^2 = 0.211538 and Q = 0.423077."""
    from census_data_pipeline_spark.functions import graph

    k4a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    k4b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    bridge = [("a0", "b0")]
    edges = spark.createDataFrame(k4a + k4b + bridge,
                                  "src string, dst string")
    labels = spark.createDataFrame(
        [(f"a{i}", "A") for i in range(4)]
        + [(f"b{i}", "B") for i in range(4)],
        "id string, community string",
    )
    rows = {r.community: r for r in graph.modularity(edges, labels)
            .collect()}
    assert rows["A"].n_nodes == 4 and rows["A"].intra_edges == 6
    assert rows["A"].degree_sum == 13
    assert rows["A"].q_contrib == pytest.approx(0.211538)
    assert rows["B"].q_contrib == pytest.approx(0.211538)
    assert rows["<all>"].q_contrib == pytest.approx(0.423076)
    assert rows["<all>"].degree_sum == 26
    assert rows["<all>"].intra_edges == 12


def test_modularity_single_community_is_zero(spark):
    """One community holding everything scores exactly Q = 0 (s_c = S
    and d_c = S), and an edge-free labeled node contributes zero
    stats but counts in n_nodes."""
    from census_data_pipeline_spark.functions import graph

    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z")], "src string, dst string")
    labels = spark.createDataFrame(
        [("x", "C"), ("y", "C"), ("z", "C"), ("lonely", "D")],
        "id string, community string")
    rows = {r.community: r for r in graph.modularity(edges, labels)
            .collect()}
    assert rows["C"].q_contrib == pytest.approx(0.0)
    assert rows["D"].n_nodes == 1 and rows["D"].degree_sum == 0
    assert rows["D"].q_contrib == 0.0
    assert rows["<all>"].q_contrib == pytest.approx(0.0)


def test_modularity_lpa_recovers_planted_communities(spark):
    """LPA on the planted two-clique graph finds the true partition and
    modularity confirms it with the exact planted-partition Q."""
    from census_data_pipeline_spark.functions import graph

    k4a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    k4b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(
        k4a + k4b + [("a0", "b0")], "src string, dst string")
    labels = graph.label_propagation(edges, iterations=5)
    rows = {r.community: r for r in graph.modularity(edges, labels)
            .collect()}
    assert rows["<all>"].q_contrib == pytest.approx(0.423076, abs=1e-6)

# --- AR(p) Yule-Walker forecasting -------------------------------------


def test_ar_constant_series_forecasts_constant(spark):
    """c_0 = 0 takes the deterministic zero-reflection branch: the
    forecast of a constant series is exactly the constant, and a key
    shorter than 2p drops out."""
    from census_data_pipeline_spark.operators import forecast

    rows = [("B", t, 5.0) for t in range(1, 21)]
    rows += [("C", t, float(t)) for t in range(1, 6)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    got = forecast.ar_forecast(df, ["k"], "t", "y", p=3, horizon=4)
    out = {(r.k, r.h): r.forecast for r in got.collect()}
    assert out == {("B", h): 5.0 for h in range(1, 5)}


def test_ar_learns_alternating_signal(spark):
    """y = 5 + 3·(−1)^t: AR(1) recovers φ ≈ −0.9 and forecasts the
    alternation within a small bias; the seasonal-naive at mismatched
    m=3 flips sign every step (mase 1), so AR must win model
    selection."""
    from census_data_pipeline_spark.operators import forecast

    rows = [("A", t, 5.0 + 3.0 * (1 if t % 2 == 0 else -1))
            for t in range(1, 31)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    fc = {r.h: r.forecast
          for r in forecast.ar_forecast(df, ["k"], "t", "y",
                                        p=1, horizon=3).collect()}
    # last train value is t=30 (even, 8.0): forecasts alternate 2, 8, 2
    assert abs(fc[1] - 2.0) < 0.8 and abs(fc[2] - 8.0) < 1.2
    sel = forecast.forecast_model_select(
        df, ["k"], "t", "y", m=3, p=1, horizon=3)
    rows = {r.model: r for r in sel.collect()}
    assert set(rows) == {"holt_winters", "ar", "seasonal_naive"}
    assert rows["ar"].best and not rows["seasonal_naive"].best
    assert rows["ar"].mase < 0.5
    assert rows["seasonal_naive"].mase == pytest.approx(1.0)


def test_ar_backtest_fold_matches_hw_protocol(spark):
    """ar_backtest holds out exactly the last `horizon` buckets and
    reports 6-dp |errors| against them (same fold as the HW backtest,
    so MASE numerators are comparable)."""
    from census_data_pipeline_spark.operators import forecast

    rows = [("A", t, float(t % 7)) for t in range(1, 41)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    bt = forecast.ar_backtest(df, ["k"], "t", "y", p=2, horizon=5)
    got = {r.h: r for r in bt.collect()}
    assert sorted(got) == [1, 2, 3, 4, 5]
    for h, r in got.items():
        assert r.actual == float((35 + h) % 7)
        assert r.abs_err == pytest.approx(abs(r.forecast - r.actual),
                                          abs=1e-6)


def test_ar_guards(spark):
    from census_data_pipeline_spark.operators import forecast

    df = spark.createDataFrame([("A", 1, 1.0)], "k string, t int, y double")
    with pytest.raises(ValueError, match="p"):
        forecast.ar_forecast(df, ["k"], "t", "y", p=0)
    with pytest.raises(ValueError, match="horizon"):
        forecast.ar_forecast(df, ["k"], "t", "y", p=1, horizon=0)
    with pytest.raises(ValueError, match="horizon"):
        forecast.seasonal_naive_mase(df, ["k"], "t", "y", m=3, horizon=5)

# --- PR-AUC (average precision) -----------------------------------------


def test_pr_auc_perfect_separation(spark):
    """A separable rule (x >= 0.6 => positive) scores AP = 1.0 and
    ROC-AUC = 1.0; prevalence reports the positive rate."""
    from census_data_pipeline_spark.functions import classify

    pts = [(i / 100.0,) for i in range(101)]
    df = spark.createDataFrame(pts, "x double")
    label = F.when(F.col("x") >= 0.6, F.lit(1.0)).otherwise(F.lit(0.0))
    row = classify.logreg_pr_auc(
        df, label, [("x", F.col("x"))], iterations=8, lr=2.0
    ).collect()[0]
    assert row.pr_auc == pytest.approx(1.0)
    assert row.n_pos == 41 and row.n_neg == 60
    assert row.prevalence == pytest.approx(41 / 101, abs=1e-6)


def test_pr_auc_random_scores_near_prevalence(spark):
    """A constant (uninformative) feature gives every row the same
    score: one histogram bucket, AP = prevalence exactly — the
    random-classifier baseline the output row documents."""
    from census_data_pipeline_spark.functions import classify

    rows = [(1.0, 1.0)] * 10 + [(1.0, 0.0)] * 90
    df = spark.createDataFrame(rows, "x double, y double")
    row = classify.logreg_pr_auc(
        df, F.col("y"), [("x", F.col("x"))], iterations=4, lr=0.1
    ).collect()[0]
    assert row.pr_auc == pytest.approx(row.prevalence, abs=1e-6)
    assert row.prevalence == pytest.approx(0.1)


def test_pr_auc_matches_sklearn_convention(spark):
    """Hand-checked AP on a 4-row ranking with one inversion:
    scores (desc) pos,neg,pos,neg -> AP = 1/2·(1/1) + 1/2·(2/3)
    = 0.833333 (tie-free step sum)."""
    from census_data_pipeline_spark.functions import classify

    scored = spark.createDataFrame(
        [(1.0, 0.9), (0.0, 0.7), (1.0, 0.5), (0.0, 0.3)],
        "__y double, __p double")
    row = classify._pr_auc_over_scores(scored).collect()[0]
    assert row.pr_auc == pytest.approx(0.833333, abs=1e-6)
    assert row.n_pos == 2 and row.n_neg == 2

# --- clustering coefficient ---------------------------------------------


def test_clustering_coefficient_known_graph(spark):
    """Triangle with a pendant: the triangle nodes have coeff 1 except
    the one carrying the pendant (deg 3, 1 triangle -> 1/3); pendant
    deg 1 -> 0. Global transitivity = 3·1 / (1+1+3+0 wedges... = 3/5)."""
    from census_data_pipeline_spark.functions import graph

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "p")],
        "src string, dst string")
    rows = {r.id: r for r in graph.clustering_coefficient(edges)
            .collect()}
    assert rows["b"].coeff == 1.0 and rows["c"].coeff == 1.0
    assert rows["a"].degree == 3 and rows["a"].triangles == 1
    assert rows["a"].coeff == pytest.approx(1 / 3, abs=1e-6)
    assert rows["p"].coeff == 0.0 and rows["p"].degree == 1
    # wedges: C(3,2)+C(2,2)+C(2,2)+C(1,2) = 3+1+1+0 = 5
    assert rows["<all>"].triangles == 1
    assert rows["<all>"].coeff == pytest.approx(3 / 5, abs=1e-6)


def test_clustering_coefficient_clique_is_one(spark):
    from census_data_pipeline_spark.functions import graph

    k4 = [(f"n{i}", f"n{j}") for i in range(4) for j in range(i + 1, 4)]
    df = spark.createDataFrame(k4, "src string, dst string")
    rows = {r.id: r.coeff for r in graph.clustering_coefficient(df)
            .collect()}
    assert all(c == 1.0 for c in rows.values())


# --- Adamic-Adar link prediction ----------------------------------------


def test_adamic_adar_scores_and_excludes_existing(spark):
    """Square a-b-c-d-a: the two diagonals are the only candidates,
    each scoring 2/ln(2); existing edges never appear; rank order is
    the (score desc, src, dst) total order."""
    import math

    from census_data_pipeline_spark.functions import graph

    square = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame(square, "src string, dst string")
    rows = graph.adamic_adar_topk(df, k=10).collect()
    got = {(r.src, r.dst): (r.score, r.rank) for r in rows}
    want_score = round(2 / math.log(2), 6)
    assert set(got) == {("a", "c"), ("b", "d")}
    assert got[("a", "c")] == (want_score, 1)
    assert got[("b", "d")] == (want_score, 2)


def test_adamic_adar_hub_cap_drops_celebrity_wedges(spark):
    """A hub connected to everyone creates wedges between all pairs;
    with max_degree below the hub's degree those wedges vanish and
    only the low-degree common neighbor contributes."""
    from census_data_pipeline_spark.functions import graph

    hub = [("hub", f"x{i}") for i in range(6)]
    shared = [("w", "x0"), ("w", "x1")]
    df = spark.createDataFrame(hub + shared, "src string, dst string")
    rows = graph.adamic_adar_topk(df, k=100, max_degree=5).collect()
    got = {(r.src, r.dst) for r in rows}
    assert ("x0", "x1") in got          # via w (deg 2 <= cap)
    assert ("x2", "x3") not in got      # only via the capped hub
    with pytest.raises(ValueError, match="k"):
        graph.adamic_adar_topk(df, k=0)
    with pytest.raises(ValueError, match="max_degree"):
        graph.adamic_adar_topk(df, k=5, max_degree=1)


# --- Theil-Sen robust trend ---------------------------------------------


def test_theil_sen_exact_on_clean_line(spark):
    """y = 3x + 7 exactly: every pair slope is 3, every residual 7."""
    from census_data_pipeline_spark.operators.rollup import (
        grouped_theil_sen,
    )

    pts = [("g", float(x), 3.0 * x + 7.0) for x in range(20)]
    df = spark.createDataFrame(pts, "g string, x double, y double")
    row = grouped_theil_sen(df, ["g"], "x", "y").collect()[0]
    assert row.slope == pytest.approx(3.0)
    assert row.intercept == pytest.approx(7.0)
    assert row.n_points == 20 and row.n_pairs == 190


def test_theil_sen_shrugs_off_outlier_where_ols_moves(spark):
    """One wild outlier: OLS slope is dragged far from 1; the Theil-Sen
    median slope stays at 1 (the estimator's whole point)."""
    from census_data_pipeline_spark.operators.rollup import (
        grouped_ols_trend, grouped_theil_sen,
    )

    pts = [("g", float(x), float(x)) for x in range(21)]
    pts[20] = ("g", 20.0, 1000.0)  # corrupted endpoint (max leverage)
    df = spark.createDataFrame(pts, "g string, x double, y double")
    ts = grouped_theil_sen(df, ["g"], "x", "y").collect()[0]
    ols = grouped_ols_trend(df, ["g"], "x", "y").collect()[0]
    assert ts.slope == pytest.approx(1.0, abs=0.01)
    assert abs(ols.slope - 1.0) > 1.0
    # constant-x group drops out (no defined pair slope)
    flat = spark.createDataFrame(
        [("h", 1.0, 1.0), ("h", 1.0, 2.0)], "g string, x double, y double")
    assert grouped_theil_sen(flat, ["g"], "x", "y").count() == 0

# --- Ljung-Box AR residual whiteness -------------------------------------


def test_ljung_box_ar1_signal_vs_unmodeled_season(spark):
    """An AR(1)-generated series fit with p=1 leaves white residuals;
    the SAME series fit cannot happen for a period-7 seasonal signal at
    p=2 — its residual autocorrelation at lag 7 blows Q past the
    critical value. Both engines' arithmetic is pinned by parity; this
    pins the STATISTICS."""
    from census_data_pipeline_spark.operators import forecast

    rows = []
    v = 0.0
    for t in range(1, 121):
        # deterministic drive with long-period irrational-ish phase so
        # the driver itself carries no short-lag autocorrelation
        drive = 1.0 if (t * 17) % 29 < 14 else -1.0
        v = 0.5 * v + drive
        rows.append(("ar1", t, round(v, 6)))
    season = [3.0, 1.0, -2.0, 0.0, 4.0, -1.0, -5.0]
    rows += [("seasonal", t, 10.0 + season[t % 7])
             for t in range(1, 121)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    got = {r.k: r for r in forecast.ar_ljung_box(
        df, ["k"], "t", "y", p=2, lags=10).collect()}
    assert got["seasonal"].white_noise is False
    assert got["seasonal"].q_stat > got["seasonal"].q_crit
    assert got["ar1"].q_stat < got["seasonal"].q_stat
    assert got["ar1"].df == 8


def test_ljung_box_guards_and_short_keys_drop(spark):
    from census_data_pipeline_spark.operators import forecast

    df = spark.createDataFrame(
        [("k", t, float(t % 3)) for t in range(1, 12)],
        "k string, t int, y double")
    # n=11 <= p + lags = 2 + 10: key drops
    assert forecast.ar_ljung_box(df, ["k"], "t", "y", p=2,
                                 lags=10).count() == 0
    with pytest.raises(ValueError, match="p"):
        forecast.ar_ljung_box(df, ["k"], "t", "y", p=0)
    with pytest.raises(ValueError, match="lags"):
        forecast.ar_ljung_box(df, ["k"], "t", "y", p=1, lags=0)

# --- bottom-k quantile sketch --------------------------------------------


def test_quantile_bottomk_small_data_is_exact(spark):
    """When n <= k the sample IS the data, so every estimate is the
    exact disc-quantile and achieved_prob lands within 1/n of prob."""
    from census_data_pipeline_spark.operators.rollup import (
        quantile_bottomk_sketch,
    )

    rows = [(i, float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r.prob: r for r in quantile_bottomk_sketch(
        df, "v", "id", probs=[0.25, 0.5, 0.9], k=4096).collect()}
    assert got[0.5].estimate == 50.0 and got[0.5].achieved_prob == 0.5
    assert got[0.25].estimate == 25.0
    assert got[0.9].estimate == 90.0
    assert all(r.sample_n == 100 for r in got.values())
    assert all(r.abs_rank_err == 0.0 for r in got.values())


def test_quantile_bottomk_mergeable_and_accurate(spark):
    """Bottom-k of the union equals bottom-k of the parts' bottom-k
    frames (the mergeability contract), and at n >> k the realized
    rank error stays inside ~4/sqrt(k)."""
    from census_data_pipeline_spark.operators.rollup import (
        quantile_bottomk_sketch,
    )

    k = 256
    rows = [(i, float((i * 7919) % 10000)) for i in range(1, 20001)]
    df = spark.createDataFrame(rows, "id long, v double")
    whole = {r.prob: r for r in quantile_bottomk_sketch(
        df, "v", "id", probs=[0.5, 0.9], k=k).collect()}
    # merge path: bottom-k of each half, then bottom-k of their union
    h1 = df.filter(F.col("id") % 2 == 0).select(
        F.md5(F.col("id").cast("string")).alias("p"), "v"
    ).orderBy("p").limit(k)
    h2 = df.filter(F.col("id") % 2 == 1).select(
        F.md5(F.col("id").cast("string")).alias("p"), "v"
    ).orderBy("p").limit(k)
    merged = set(
        r.p for r in h1.unionByName(h2).orderBy("p").limit(k).collect()
    )
    direct = set(
        r.p for r in df.select(
            F.md5(F.col("id").cast("string")).alias("p")
        ).orderBy("p").limit(k).collect()
    )
    assert merged == direct
    bound = 4 / (k ** 0.5)  # ~0.25 at k=256
    assert whole[0.5].abs_rank_err < bound
    assert whole[0.9].abs_rank_err < bound
    with pytest.raises(ValueError, match="probs"):
        quantile_bottomk_sketch(df, "v", "id", probs=[1.5])
    with pytest.raises(ValueError, match="k"):
        quantile_bottomk_sketch(df, "v", "id", k=0)


# --- conductance ---------------------------------------------------------


def test_conductance_planted_two_cliques(spark):
    """Two K4s joined by one bridge, scored against the TRUE partition:
    each community has vol = 13 (within-clique degree 3×3 + bridge
    endpoint 4), cut = 1, S = 26, so φ = 1/min(13, 13) = 0.076923 for
    both — and the '<all>' volume-weighted mean equals the same."""
    from census_data_pipeline_spark.functions import graph

    k4a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    k4b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(k4a + k4b + [("a0", "b0")],
                                  "src string, dst string")
    labels = spark.createDataFrame(
        [(f"a{i}", "A") for i in range(4)]
        + [(f"b{i}", "B") for i in range(4)],
        "id string, community string",
    )
    rows = {r.community: r for r in graph.conductance(edges, labels)
            .collect()}
    assert rows["A"].n_nodes == 4 and rows["A"].cut_edges == 1
    assert rows["A"].volume == 13
    assert rows["A"].phi == pytest.approx(0.076923)
    assert rows["B"].phi == pytest.approx(0.076923)
    assert rows["<all>"].volume == 26 and rows["<all>"].cut_edges == 2
    assert rows["<all>"].phi == pytest.approx(0.076923)


def test_conductance_degenerate_communities_are_null(spark):
    """A community holding the WHOLE graph has min(vol, S−vol) = 0 →
    φ NULL; an edge-free community is NULL too; the '<all>' mean
    excludes NULLs (here: no defined φ at all → NULL)."""
    from census_data_pipeline_spark.functions import graph

    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z")], "src string, dst string")
    labels = spark.createDataFrame(
        [("x", "C"), ("y", "C"), ("z", "C"), ("lonely", "D")],
        "id string, community string")
    rows = {r.community: r for r in graph.conductance(edges, labels)
            .collect()}
    assert rows["C"].phi is None and rows["C"].volume == 4
    assert rows["D"].phi is None and rows["D"].volume == 0
    assert rows["<all>"].phi is None


def test_conductance_separates_good_from_bad_cut(spark):
    """On the planted two-clique graph the TRUE partition's weighted φ
    must beat (be lower than) a deliberately wrong split that cuts
    through a clique."""
    from census_data_pipeline_spark.functions import graph

    k4a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    k4b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(k4a + k4b + [("a0", "b0")],
                                  "src string, dst string")
    true_lab = spark.createDataFrame(
        [(f"a{i}", "A") for i in range(4)]
        + [(f"b{i}", "B") for i in range(4)],
        "id string, community string")
    # wrong split: a0,a1,b0,b1 vs a2,a3,b2,b3 slices both cliques
    wrong_lab = spark.createDataFrame(
        [("a0", "W1"), ("a1", "W1"), ("b0", "W1"), ("b1", "W1"),
         ("a2", "W2"), ("a3", "W2"), ("b2", "W2"), ("b3", "W2")],
        "id string, community string")
    phi_true = {r.community: r.phi
                for r in graph.conductance(edges, true_lab).collect()}
    phi_wrong = {r.community: r.phi
                 for r in graph.conductance(edges, wrong_lab).collect()}
    assert phi_true["<all>"] < phi_wrong["<all>"]


# --- Jaccard link prediction ---------------------------------------------


def test_jaccard_scores_and_excludes_existing(spark):
    """Square a-b-c-d-a: diagonals are the only candidates, each with
    2 common neighbors out of a union of 2 (deg 2 + deg 2 − 2), so
    J = 1.0; existing edges never appear; ranks follow the
    (score desc, src, dst) total order."""
    from census_data_pipeline_spark.functions import graph

    square = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame(square, "src string, dst string")
    rows = graph.jaccard_topk(df, k=10).collect()
    got = {(r.src, r.dst): (r.common, r.score, r.rank) for r in rows}
    assert set(got) == {("a", "c"), ("b", "d")}
    assert got[("a", "c")] == (2, 1.0, 1)
    assert got[("b", "d")] == (2, 1.0, 2)


def test_jaccard_union_uses_true_degrees_past_hub_cap(spark):
    """The hub cap gates which wedges GENERATE candidates, but the
    union denominator uses TRUE degrees: x0 and x1 share only the
    low-degree w as a counted apex, yet their degrees still include
    the capped hub, so J = 1 / (3 + 3 − 1) = 0.2."""
    from census_data_pipeline_spark.functions import graph

    hub = [("hub", f"x{i}") for i in range(6)]
    shared = [("w", "x0"), ("w", "x1"), ("v", "x0"), ("v", "x1")]
    df = spark.createDataFrame(hub + shared, "src string, dst string")
    rows = graph.jaccard_topk(df, k=100, max_degree=5).collect()
    got = {(r.src, r.dst): (r.common, r.score) for r in rows}
    # x0, x1 each have true degree 3 (hub, w, v); common counted via
    # w and v only (hub capped) = 2 → J = 2 / (3 + 3 - 2) = 0.5
    assert got[("x0", "x1")] == (2, 0.5)
    assert ("x2", "x3") not in got      # only via the capped hub
    with pytest.raises(ValueError, match="k"):
        graph.jaccard_topk(df, k=0)
    with pytest.raises(ValueError, match="max_degree"):
        graph.jaccard_topk(df, k=5, max_degree=1)


# --- ACF -------------------------------------------------------------------


def test_acf_alternating_series(spark):
    """A perfect ±alternation has r_1 ≈ −1 and r_2 ≈ +1 (biased
    estimator shrinks by (n−k)/n), both flagged significant against
    the 1.96/√n band."""
    from census_data_pipeline_spark.operators import forecast

    n = 96
    rows = [("k", t, float(t % 2)) for t in range(1, n + 1)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    got = {r.lag: r for r in forecast.acf(df, ["key"], "t", "y",
                                          lags=4).collect()}
    assert got[1].acf == pytest.approx(-1.0 + 1.0 / n, abs=1e-4)
    assert got[2].acf == pytest.approx(1.0 - 2.0 / n, abs=1e-4)
    assert got[1].band == pytest.approx(1.96 / n ** 0.5, abs=1e-6)
    assert got[1].significant and got[2].significant


def test_acf_constant_series_is_null(spark):
    """c_0 = 0 → NULL acf, significant false (never a div-by-zero)."""
    from census_data_pipeline_spark.operators import forecast

    rows = [("k", t, 5.0) for t in range(1, 33)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    out = forecast.acf(df, ["key"], "t", "y", lags=8).collect()
    assert len(out) == 8
    assert all(r.acf is None and r.significant is False for r in out)


def test_acf_short_key_drops_and_guard(spark):
    from census_data_pipeline_spark.operators import forecast

    rows = [("short", t, float(t)) for t in range(1, 10)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    assert forecast.acf(df, ["key"], "t", "y", lags=8).count() == 0
    with pytest.raises(ValueError, match="lags"):
        forecast.acf(df, ["key"], "t", "y", lags=0)


def test_acf_period_cycle_peaks_at_season_lag(spark):
    """A period-8 cosine peaks positive at lag 8 and dips negative at
    lag 4 — the identification signature the diagnostic exists for."""
    import math

    from census_data_pipeline_spark.operators import forecast

    rows = [("k", t, math.cos(2 * math.pi * t / 8))
            for t in range(1, 129)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    got = {r.lag: r.acf for r in forecast.acf(df, ["key"], "t", "y",
                                              lags=12).collect()}
    assert got[8] > 0.8 and got[4] < -0.8
    assert got[8] > got[12] > got[4] or got[8] > 0 > got[4]


# --- offline changepoint ----------------------------------------------------


def test_changepoint_planted_step(spark):
    """A clean 0→10 step at t=50 in 100 buckets: t* = 50, the means
    bracket the step exactly, and the statistic clears the 95% cut."""
    from census_data_pipeline_spark.operators import forecast

    rows = [("k", t, 0.0 if t <= 50 else 10.0) for t in range(1, 101)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    r = forecast.changepoint_cusum(df, ["key"], "t", "y").collect()[0]
    assert r.t_star == 50
    assert r.mean_before == pytest.approx(0.0)
    assert r.mean_after == pytest.approx(10.0)
    assert r.delta == pytest.approx(10.0)
    assert r.significant and r.stat > 1.358099


def test_changepoint_constant_series(spark):
    """Constant series: σ̂ = 0 → stat 0, not significant, t* = 1 (the
    first index wins when every |S_t| ties at 0)."""
    from census_data_pipeline_spark.operators import forecast

    rows = [("k", t, 7.0) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    r = forecast.changepoint_cusum(df, ["key"], "t", "y").collect()[0]
    assert r.stat == 0.0 and r.significant is False
    assert r.t_star == 1
    assert r.mean_before == pytest.approx(7.0)
    assert r.mean_after == pytest.approx(7.0)
    assert r.delta == pytest.approx(0.0)


def test_changepoint_short_key_drops(spark):
    from census_data_pipeline_spark.operators import forecast

    rows = [("k", t, float(t)) for t in range(1, 8)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    assert forecast.changepoint_cusum(df, ["key"], "t", "y").count() == 0


def test_changepoint_detects_drift_and_ignores_stationary_noise(spark):
    """CUSUM flags ANY mean non-stationarity — a linear ramp triggers
    (stat ≈ 0.433·√n ≫ 1.358 at n=100) — while seeded stationary noise
    stays under the sup-Brownian-bridge 95% cut."""
    import random

    from census_data_pipeline_spark.operators import forecast

    ramp = [("ramp", t, float(t)) for t in range(1, 101)]
    rng = random.Random(42)
    noise = [("noise", t, rng.gauss(0.0, 1.0)) for t in range(1, 201)]
    df = spark.createDataFrame(ramp + noise,
                               "key string, t int, y double")
    got = {r.key: r for r in
           forecast.changepoint_cusum(df, ["key"], "t", "y").collect()}
    assert got["ramp"].significant and got["ramp"].stat > 1.358099
    assert not got["noise"].significant


# --- seasonal decomposition --------------------------------------------------


def test_seasonal_decompose_pure_seasonal(spark):
    """y = 10 + s[phase] with a sum-zero period-4 pattern and no trend:
    trend is exactly 10 wherever defined, the seasonal indices recover
    the pattern, and every defined remainder is 0."""
    from census_data_pipeline_spark.operators import forecast

    pat = {1: 3.0, 2: -1.0, 3: -4.0, 4: 2.0}
    rows = [("k", t, 10.0 + pat[(t - 1) % 4 + 1])
            for t in range(1, 41)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    out = forecast.seasonal_decompose(df, ["key"], "t", "y",
                                      period=4).collect()
    assert len(out) == 40
    by_t = {r.t: r for r in out}
    assert by_t[1].trend is None and by_t[2].trend is None
    assert by_t[39].trend is None and by_t[40].trend is None
    for t in range(3, 39):
        assert by_t[t].trend == pytest.approx(10.0, abs=1e-6), t
        assert by_t[t].remainder == pytest.approx(0.0, abs=1e-5), t
    for t in range(1, 41):
        assert by_t[t].seasonal == pytest.approx(
            pat[(t - 1) % 4 + 1], abs=1e-5), t


def test_seasonal_decompose_trend_plus_seasonal(spark):
    """y = t + s[phase]: the centered MA recovers the linear trend
    exactly (a symmetric window is unbiased on a line) and the
    remainder vanishes."""
    from census_data_pipeline_spark.operators import forecast

    pat = {1: 1.0, 2: -1.0}
    rows = [("k", t, float(t) + pat[(t - 1) % 2 + 1])
            for t in range(1, 25)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    out = {r.t: r for r in forecast.seasonal_decompose(
        df, ["key"], "t", "y", period=2).collect()}
    for t in range(2, 24):
        assert out[t].trend == pytest.approx(float(t), abs=1e-5), t
        assert out[t].remainder == pytest.approx(0.0, abs=1e-4), t
    assert out[5].seasonal == pytest.approx(1.0, abs=1e-5)
    assert out[6].seasonal == pytest.approx(-1.0, abs=1e-5)


def test_seasonal_decompose_guards(spark):
    from census_data_pipeline_spark.operators import forecast

    rows = [("k", t, float(t)) for t in range(1, 8)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    # n = 7 < 2*4 → key drops
    assert forecast.seasonal_decompose(df, ["key"], "t", "y",
                                       period=4).count() == 0
    with pytest.raises(ValueError, match="period"):
        forecast.seasonal_decompose(df, ["key"], "t", "y", period=1)


# --- Mann-Whitney U ----------------------------------------------------------


def test_mann_whitney_separated_arms(spark):
    """A = {1,2,3} vs B = {4,5,6}: U_a = 0, U_b = 9, z = −4.5/√5.25 =
    −1.963961 — just over the 95% cut."""
    from census_data_pipeline_spark.operators.rollup import mann_whitney_u

    rows = [("g", True, 1.0), ("g", True, 2.0), ("g", True, 3.0),
            ("g", False, 4.0), ("g", False, 5.0), ("g", False, 6.0)]
    df = spark.createDataFrame(rows, "g string, is_a boolean, v double")
    r = mann_whitney_u(df, ["g"], F.col("is_a"), "v").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.u_a == 0.0 and r.u_b == 9.0
    assert r.z_stat == pytest.approx(-1.963961, abs=1e-5)
    assert r.significant_95


def test_mann_whitney_tie_correction(spark):
    """A = {1,1,2}, B = {1,2,2}: midranks 2/2/5 vs 2/5/5, U_a = 3,
    tie term Σ(t³−t) = 48 shrinks the variance to 4.05."""
    from census_data_pipeline_spark.operators.rollup import mann_whitney_u

    rows = [("g", True, 1.0), ("g", True, 1.0), ("g", True, 2.0),
            ("g", False, 1.0), ("g", False, 2.0), ("g", False, 2.0)]
    df = spark.createDataFrame(rows, "g string, is_a boolean, v double")
    r = mann_whitney_u(df, ["g"], F.col("is_a"), "v").collect()[0]
    assert r.u_a == 3.0 and r.u_b == 6.0
    assert r.z_stat == pytest.approx(-1.5 / 4.05 ** 0.5, abs=1e-5)
    assert not r.significant_95


def test_mann_whitney_degenerate_null(spark):
    """All values identical → tie-corrected variance 0 → NULL z; an
    empty arm → NULL z as well."""
    from census_data_pipeline_spark.operators.rollup import mann_whitney_u

    same = [("same", c, 5.0) for c in (True, True, False, False)]
    onearm = [("onearm", True, float(i)) for i in range(4)]
    df = spark.createDataFrame(same + onearm,
                               "g string, is_a boolean, v double")
    got = {r.g: r for r in
           mann_whitney_u(df, ["g"], F.col("is_a"), "v").collect()}
    assert got["same"].z_stat is None
    assert got["same"].significant_95 is None
    assert got["onearm"].z_stat is None and got["onearm"].u_b is None


# --- Spearman rank correlation ----------------------------------------------


def test_spearman_monotone_nonlinear_is_one(spark):
    """y = x³ is far from linear but perfectly monotone: ρ = 1 exactly
    (where Pearson would be < 1), z = √(n−1)."""
    from census_data_pipeline_spark.operators.rollup import spearman_corr

    rows = [("k", float(x), float(x) ** 3) for x in range(1, 21)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = spearman_corr(df, ["k"], "x", "y").collect()[0]
    assert r.rho == pytest.approx(1.0)
    assert r.z_stat == pytest.approx(19 ** 0.5, abs=1e-5)
    assert r.significant_95


def test_spearman_inverse_and_ties(spark):
    """Reversed order gives ρ = −1; tied midranks on both sides still
    line up to ρ = 1."""
    from census_data_pipeline_spark.operators.rollup import spearman_corr

    inv = [("inv", float(x), float(-x)) for x in range(1, 11)]
    tie = [("tie", 1.0, 10.0), ("tie", 2.0, 20.0),
           ("tie", 2.0, 20.0), ("tie", 3.0, 40.0)]
    df = spark.createDataFrame(inv + tie, "k string, x double, y double")
    got = {r.k: r for r in spearman_corr(df, ["k"], "x", "y").collect()}
    assert got["inv"].rho == pytest.approx(-1.0)
    assert got["tie"].rho == pytest.approx(1.0)


def test_spearman_constant_column_is_null(spark):
    from census_data_pipeline_spark.operators.rollup import spearman_corr

    rows = [("k", float(x), 7.0) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = spearman_corr(df, ["k"], "x", "y").collect()[0]
    assert r.rho is None and r.significant_95 is None


def test_spearman_shrugs_off_outlier_that_wrecks_pearson(spark):
    """One wild outlier on otherwise-linear data: Pearson collapses,
    Spearman stays 1 because the outlier keeps its rank."""
    from census_data_pipeline_spark.operators.rollup import spearman_corr

    rows = [("k", float(x), float(x)) for x in range(1, 20)]
    rows.append(("k", 20.0, 1e6))
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = spearman_corr(df, ["k"], "x", "y").collect()[0]
    assert r.rho == pytest.approx(1.0)
    pearson = df.groupBy("k").agg(F.corr("x", "y")).collect()[0][1]
    assert pearson < 0.6


# --- Nelson-Aalen cumulative hazard -------------------------------------------


def test_nelson_aalen_hand_computed(spark):
    """durations {1✓,1✓,2✗,3✓}: H jumps 2/4 then 1/1, variance sums
    d/n², survival_fh = exp(−H)."""
    from census_data_pipeline_spark.operators import survival

    rows = [(1, 1), (1, 1), (2, 0), (3, 1)]
    df = spark.createDataFrame(rows, "duration int, observed int")
    got = {r.duration: r for r in survival.nelson_aalen(df).collect()}
    assert got[1].n_risk == 4 and got[1].n_events == 2
    assert got[1].hazard_inc == pytest.approx(0.5)
    assert got[1].cum_hazard == pytest.approx(0.5)
    assert got[1].var_hazard == pytest.approx(2 / 16)
    assert got[1].survival_fh == pytest.approx(math.exp(-0.5), abs=1e-6)
    assert got[2].n_risk == 2 and got[2].n_events == 0
    assert got[2].cum_hazard == pytest.approx(0.5)
    assert got[3].n_risk == 1
    assert got[3].cum_hazard == pytest.approx(1.5)
    assert got[3].var_hazard == pytest.approx(2 / 16 + 1.0)
    assert got[3].survival_fh == pytest.approx(math.exp(-1.5), abs=1e-6)


def test_nelson_aalen_dominates_km(spark):
    """Fleming–Harrington exp(−H) is ≥ the KM product at every time
    (1−x ≤ e^−x), and the two agree closely while risk sets are
    large."""
    from census_data_pipeline_spark.operators import survival

    rows = [(t, 1 if t % 3 else 0) for t in range(1, 40)]
    df = spark.createDataFrame(rows, "duration int, observed int")
    na = {r.duration: r.survival_fh
          for r in survival.nelson_aalen(df).collect()}
    km = {r.duration: r.survival
          for r in survival.kaplan_meier(df).collect()}
    assert set(na) == set(km)
    for t in na:
        assert na[t] >= km[t] - 1e-9, t
    assert na[1] == pytest.approx(km[1], abs=1e-3)


# --- Jensen-Shannon corpus divergence ------------------------------------------


def test_js_divergence_identical_slices_is_zero(spark):
    from census_data_pipeline_spark.functions import text as t

    rows = [(i, "aaa bbb ccc", i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, a boolean")
    r = t.js_divergence(df, F.col("a")).collect()[0]
    assert r.jsd_nats == pytest.approx(0.0)
    assert r.jsd_normalized == pytest.approx(0.0)
    assert r.n_tokens_a == 15 and r.n_tokens_b == 15


def test_js_divergence_disjoint_vocab_is_ln2(spark):
    from census_data_pipeline_spark.functions import text as t

    rows = [(1, "aaa bbb aaa", True), (2, "ccc ddd eee", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, a boolean")
    r = t.js_divergence(df, F.col("a")).collect()[0]
    assert r.jsd_nats == pytest.approx(math.log(2.0), abs=1e-6)
    assert r.jsd_normalized == pytest.approx(1.0, abs=1e-6)


def test_js_divergence_empty_side_is_null_and_guard(spark):
    from census_data_pipeline_spark.functions import text as t

    rows = [(1, "aaa bbb", True), (2, "ccc", True)]
    df = spark.createDataFrame(rows, "doc_id long, text string, a boolean")
    r = t.js_divergence(df, F.col("a")).collect()[0]
    assert r.jsd_nats is None and r.jsd_normalized is None
    with pytest.raises(ValueError, match="resolution"):
        t.js_divergence(df, F.col("a"), resolution=1024)


# --- Kruskal-Wallis -----------------------------------------------------------


def test_kruskal_wallis_hand_computed(spark):
    """Three fully-separated arms {1,2,3} < {4,5,6} < {7,8,9}: no ties,
    H = 12/(9·10)·279 − 33 = 7.2 > χ²(2)'s 5.99 cut."""
    from census_data_pipeline_spark.operators.rollup import kruskal_wallis

    rows = ([("g", "a", float(v)) for v in (1, 2, 3)]
            + [("g", "b", float(v)) for v in (4, 5, 6)]
            + [("g", "c", float(v)) for v in (7, 8, 9)])
    df = spark.createDataFrame(rows, "g string, k string, v double")
    r = kruskal_wallis(df, ["g"], "k", "v").collect()[0]
    assert (r.n, r.k, r.dof) == (9, 3, 2)
    assert r.h_stat == pytest.approx(7.2)
    assert r.significant_95


def test_kruskal_wallis_two_arms_equals_mw_z_squared(spark):
    """With k = 2 the tie-corrected H is exactly the Mann–Whitney z²
    (the defining identity) — checked on the tied example where
    z² = 2.25/4.05."""
    from census_data_pipeline_spark.operators.rollup import kruskal_wallis

    rows = [("g", "A", 1.0), ("g", "A", 1.0), ("g", "A", 2.0),
            ("g", "B", 1.0), ("g", "B", 2.0), ("g", "B", 2.0)]
    df = spark.createDataFrame(rows, "g string, k string, v double")
    r = kruskal_wallis(df, ["g"], "k", "v").collect()[0]
    assert r.dof == 1
    assert r.h_stat == pytest.approx(2.25 / 4.05, abs=1e-5)
    assert not r.significant_95


def test_kruskal_wallis_degenerate_null(spark):
    """A single cohort (dof 0) and an all-tied value column (tie
    correction 0) both yield NULL H instead of a division blowup."""
    from census_data_pipeline_spark.operators.rollup import kruskal_wallis

    onek = [("onek", "A", float(v)) for v in range(1, 6)]
    tied = [("tied", c, 5.0) for c in ("A", "B", "A", "B")]
    df = spark.createDataFrame(onek + tied, "g string, k string, v double")
    got = {r.g: r for r in kruskal_wallis(df, ["g"], "k", "v").collect()}
    assert got["onek"].h_stat is None and got["onek"].dof == 0
    assert got["tied"].h_stat is None
    assert got["tied"].significant_95 is None


# --- degree assortativity -------------------------------------------------------


def test_assortativity_star_is_minus_one(spark):
    """K1,5: every edge pairs the degree-5 hub with a degree-1 leaf —
    the degree pairs sit on a perfectly decreasing line, r = −1."""
    from census_data_pipeline_spark.functions import graph

    edges = [("hub", f"x{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = graph.degree_assortativity(df).collect()[0]
    assert (r.n_nodes, r.n_edges) == (6, 5)
    assert r.assortativity == pytest.approx(-1.0)


def test_assortativity_regular_graph_is_null(spark):
    """A cycle is 2-regular: zero degree variance → NULL, not NaN."""
    from census_data_pipeline_spark.functions import graph

    edges = [(f"c{i}", f"c{(i + 1) % 6}") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = graph.degree_assortativity(df).collect()[0]
    assert r.assortativity is None and r.n_edges == 6


def test_assortativity_homophilous_cliques_positive(spark):
    """Disjoint K3 ∪ K5: every edge pairs equal degrees (2,2) or (4,4)
    → r = +1 (perfect assortativity)."""
    from census_data_pipeline_spark.functions import graph

    k3 = [(f"a{i}", f"a{j}") for i in range(3) for j in range(i + 1, 3)]
    k5 = [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(k3 + k5, "src string, dst string")
    r = graph.degree_assortativity(df).collect()[0]
    assert r.assortativity == pytest.approx(1.0)

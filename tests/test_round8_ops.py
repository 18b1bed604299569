"""Round-8 pins for the five r7 end-of-round sweep fixes (VERDICT r7 #2):
each landed without a test; these make them regressions-proof.

1. LPA keeps self-loop-only nodes as singleton communities (graph.py).
2. Zero-norm vectors through the BLAS exact dup path (similarity.py).
3. Null embeddings through the Arrow moments path stay output-identical
   to the Catalyst explode path (similarity.py).
4. cms_build cnt dtype contract: long for integral weights, double (no
   truncation) for fractional ones (rollup.py).
5. write_bucketed heals the RIGHT directory for db-qualified names and
   never touches EXTERNAL table data (bucketing.py, ADVICE r7).
"""

from __future__ import annotations

import os
import warnings

import pytest
from pyspark.sql import functions as F

from census_data_pipeline_spark.functions import graph, similarity
from census_data_pipeline_spark.operators import rollup
from census_data_pipeline_spark.sources import bucketing


# --- 1. LPA self-loop-only node --------------------------------------


def test_lpa_selfloop_only_node_is_singleton_community(spark):
    """A node whose ONLY edges are self-loops must appear in the output
    as its own community (ADVICE r6 fix; re-pinned after the r8 node-set
    derivation moved from the raw edge list to sym + self-loop
    endpoints)."""
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 5)], "src long, dst long"
    )
    out = {r.id: r.community
           for r in graph.label_propagation(e, iterations=3).collect()}
    assert 5 in out, "self-loop-only node dropped from the node set"
    assert out[5] == 5  # no neighbors -> keeps its own label
    # the connected component is still intact and converges to min label
    assert set(out) == {1, 2, 3, 5}
    assert out[1] == out[2] == out[3] == 1


def test_lpa_selfloop_does_not_double_vote(spark):
    """A self-loop must NOT add an extra vote for the node's own label on
    top of the standard self-vote — the engine filters src=dst out of the
    symmetrized vote edges, and the oracle mirrors it (ADVICE r7). Node 2
    has neighbors 1 and 3 (both labelled lower) plus a self-loop: with
    the loop correctly excluded, votes are {1:1, 3:1, 2:1(self)} and the
    smallest label 1 wins round one; a double self-vote would freeze
    node 2 on label 2 forever."""
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 2)], "src long, dst long"
    )
    out = {r.id: r.community
           for r in graph.label_propagation(e, iterations=1).collect()}
    assert out[2] == 1


# --- 2. zero-norm vectors through the BLAS exact path -----------------


def test_blas_exact_dup_pairs_zero_norm_guard(spark):
    """A zero vector must score cosine 0 against everything (declared
    rule, not IEEE NaN accident): it appears in no pair at any positive
    threshold, real duplicate pairs still surface, and numpy emits no
    invalid-divide RuntimeWarning."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),      # exact dup of 1
            (3, [0.0, 0.0, 0.0]),      # zero vector
            (4, [0.0, 1.0, 0.0]),      # orthogonal to 1/2
        ],
        "vec_id long, embedding array<double>",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        pairs = {
            (r.id_a, r.id_b): r.cosine_sim
            for r in similarity.embedding_dup_pairs(
                df, threshold=0.9, method="exact"
            ).collect()
        }
    assert pairs == {(1, 2): pytest.approx(1.0)}
    assert all(p == p for p in pairs.values())  # no NaN


# --- 3. null embeddings through the Arrow moments path ----------------


def test_pca_arrow_moments_null_identity(spark):
    """moments='arrow' must silently drop null vectors exactly like the
    Catalyst posexplode path (which never emits rows for them), keeping
    the two documented-output-identical modes identical on dirty
    input — and must not crash np.stack on the null row."""
    rows = [
        (i, [float(i % 7) + 1.0, float((3 * i) % 5), float(i % 2) * 2.0])
        for i in range(40)
    ]
    rows += [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cat = similarity.pca_power_dominant(
        df, "embedding", iterations=4, moments="catalyst"
    ).orderBy("dim_idx").collect()
    arr = similarity.pca_power_dominant(
        df, "embedding", iterations=4, moments="arrow"
    ).orderBy("dim_idx").collect()
    assert [r.asDict() for r in cat] == [r.asDict() for r in arr]


# --- 4. cms_build cnt dtype contract ----------------------------------


def _cms_totals(sk):
    return {r["bucket"]: r["cnt"] for r in sk.filter(F.col("row_id") == 0)
            .collect()}


def test_cms_fractional_weights_double_no_truncation(spark):
    df = spark.createDataFrame(
        [("a", 0.5), ("a", 0.25), ("b", 0.5)], "k string, w double"
    )
    sk = rollup.cms_build(df, "k", depth=2, width_hex=2, weight_col="w")
    assert dict(sk.dtypes)["cnt"] == "double"
    assert sorted(_cms_totals(sk).values()) == [0.5, 0.75]


def test_cms_integral_weights_keep_long_schema(spark):
    """Integer-weighted sketches must keep the unweighted long schema so
    they stay union+groupBy-sum mergeable with unweighted sketches
    (ADVICE r7 dtype-contract)."""
    dfw = spark.createDataFrame([("a", 2), ("b", 3)], "k string, w int")
    dfu = spark.createDataFrame([("a",), ("b",), ("b",)], "k string")
    skw = rollup.cms_build(dfw, "k", depth=2, width_hex=2, weight_col="w")
    sku = rollup.cms_build(dfu, "k", depth=2, width_hex=2)
    assert dict(skw.dtypes)["cnt"] == "bigint"
    assert dict(sku.dtypes)["cnt"] == "bigint"
    # merge across the weighted/unweighted builds: one union + sum
    merged = (
        skw.union(sku).groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert dict(merged.dtypes)["cnt"] == "bigint"
    assert sorted(_cms_totals(merged).values()) == [3, 5]  # a:2+1, b:3+2


# --- top-r PCA (VERDICT r6 #5 / r7 #4) --------------------------------


def _planted_3axis(spark, n=240, d=8):
    """Deterministic corpus with variance planted along three rotated
    axes with well-separated strengths (12 > 6 > 3) plus tiny structured
    noise — numpy eigendecomposition recovers the axes exactly enough to
    pin the engine against. No RNG: coefficients are modular arithmetic
    on the row index."""
    import numpy as np

    rng_free = np.array(
        [[(i * 7 + 3) % 11 - 5, (i * 5 + 1) % 9 - 4, (i * 3 + 2) % 7 - 3]
         for i in range(n)],
        dtype=np.float64,
    )
    axes = np.zeros((3, d))
    axes[0, 0] = axes[0, 1] = 1 / np.sqrt(2)
    axes[1, 2] = 1.0
    axes[2, 3] = axes[2, 4] = axes[2, 5] = 1 / np.sqrt(3)
    scales = np.array([4.0, 2.0, 1.0])
    mat = (rng_free * scales) @ axes
    mat[:, d - 1] += 0.01 * ((np.arange(n) % 5) - 2)  # break exact rank-3
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, mat


def test_pca_topr_orthogonal_and_matches_numpy(spark):
    import numpy as np

    df, mat = _planted_3axis(spark)
    d = mat.shape[1]
    out = similarity.pca_power_topr(df, "embedding", r=3, iterations=12,
                                    dim=d)
    rows = {(r.component, r.dim_idx): r for r in out.collect()}
    V = np.zeros((3, d))
    eig = np.zeros(3)
    for (c, i), row in rows.items():
        V[c - 1, i] = row.loading
        eig[c - 1] = row.eigenvalue
    # pairwise orthogonality + unit norms (post-rounding tolerance)
    for a in range(3):
        assert abs(np.linalg.norm(V[a]) - 1) < 1e-4
        for b in range(a + 1, 3):
            assert abs(V[a] @ V[b]) < 1e-4
    # numpy reference: top-3 eigenpairs of the population covariance
    C = np.cov(mat, rowvar=False, bias=True)
    w, U = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    for k in range(3):
        ref_val, ref_vec = w[order[k]], U[:, order[k]]
        assert abs(eig[k] - ref_val) / ref_val < 1e-3, (k, eig[k], ref_val)
        assert abs(abs(V[k] @ ref_vec) - 1) < 1e-3, (k, V[k] @ ref_vec)
    # explained ratios against the trace
    tr = np.trace(C)
    for k in range(3):
        assert abs(rows[(k + 1, 0)].explained_ratio - eig[k] / tr) < 1e-5


def test_pca_topr_r1_matches_dominant(spark):
    """r=1 must reproduce pca_power_dominant exactly — same covariance,
    same trajectory, same rounding points."""
    df, _ = _planted_3axis(spark, n=60)
    top = similarity.pca_power_topr(
        df, "embedding", r=1, iterations=5, dim=8
    ).drop("component").orderBy("dim_idx").collect()
    dom = similarity.pca_power_dominant(
        df, "embedding", iterations=5, dim=8
    ).orderBy("dim_idx").collect()
    assert [r.asDict() for r in top] == [r.asDict() for r in dom]


def test_pca_topr_guards(spark):
    df, _ = _planted_3axis(spark, n=10)
    with pytest.raises(ValueError, match="r must be"):
        similarity.pca_power_topr(df, "embedding", r=0)
    with pytest.raises(ValueError, match="exceeds dim"):
        similarity.pca_power_topr(df, "embedding", r=9, dim=8)
    with pytest.raises(ValueError, match="moments"):
        similarity.pca_power_topr(df, "embedding", moments="x", dim=8)


# --- IVM retraction form (VERDICT r6 #4 / r7 #3) ----------------------


def _retraction_fixture(spark):
    """Base table of (k, v); snapshot over it; a CDC batch that kills
    group 'dead' entirely, retracts the current max of 'mixed' while
    inserting a smaller row, births group 'born', and leaves 'calm'
    untouched."""
    base = spark.createDataFrame(
        [("dead", 10.0), ("dead", 20.0),
         ("mixed", 5.0), ("mixed", 50.0),
         ("calm", 7.0)],
        "k string, v double",
    )
    snapshot = base.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").alias("sv"),
        F.max("v").alias("mv"),
    )
    delta = spark.createDataFrame(
        [("dead", 10.0, -1), ("dead", 20.0, -1),   # group death
         ("mixed", 50.0, -1), ("mixed", 8.0, 1),   # retract the max
         ("born", 3.0, 1), ("born", 4.0, 1)],      # group birth
        "k string, v double, __sign int",
    )
    base_after = spark.createDataFrame(
        [("mixed", 5.0), ("mixed", 8.0), ("calm", 7.0),
         ("born", 3.0), ("born", 4.0)],
        "k string, v double",
    )
    def vals(df):
        return df.select("k", F.col("v").alias("sv"), F.col("v").alias("mv"),
                         *(["__sign"] if "__sign" in df.columns else []))
    return snapshot, vals(delta), vals(base_after)


def test_ivm_retraction_merge_exactness(spark):
    snapshot, delta, base_after = _retraction_fixture(spark)
    out = {
        r.k: (r.n, r.sv, r.mv)
        for r in rollup.ivm_retraction_merge(
            snapshot, delta, ["k"], "n", ["sv"], [("max", "mv")], base_after
        ).collect()
    }
    assert "dead" not in out                    # count reached 0 -> dropped
    assert out["born"] == (2, 7.0, 4.0)         # born entirely from delta
    assert out["calm"] == (1, 7.0, 7.0)         # untouched group unchanged
    # retracting the max forces the confined repair: 50 gone, 8 inserted
    assert out["mixed"] == (2, 13.0, 8.0)
    assert set(out) == {"born", "calm", "mixed"}


def test_ivm_retraction_merge_min_and_insert_only_tightening(spark):
    """Insert-only groups tighten extremes WITHOUT a repair scan; min
    kind mirrors max."""
    snapshot = spark.createDataFrame(
        [("a", 2, 9.0, 4.0)], "k string, n long, sv double, mn double"
    )
    delta = spark.createDataFrame(
        [("a", 3.0, 1)], "k string, mn double, __sign int"
    ).select("k", F.col("mn").alias("sv"), "mn", "__sign")
    base_after = spark.createDataFrame(
        [("a", 4.0), ("a", 5.0), ("a", 3.0)], "k string, mn double"
    ).select("k", F.col("mn").alias("sv"), "mn")
    out = rollup.ivm_retraction_merge(
        snapshot, delta, ["k"], "n", ["sv"], [("min", "mn")], base_after
    ).collect()[0]
    assert (out.n, out.sv, out.mn) == (3, 12.0, 3.0)


def test_ivm_retraction_merge_guards(spark):
    snapshot = spark.createDataFrame([("a", 1, 1.0)],
                                     "k string, n long, sv double")
    delta = spark.createDataFrame([("a", 1.0, -1)],
                                  "k string, sv double, __sign int")
    with pytest.raises(ValueError, match="base_after"):
        rollup.ivm_retraction_merge(
            snapshot, delta, ["k"], "n", ["sv"], [("max", "sv")]
        )
    with pytest.raises(ValueError, match="min/max"):
        rollup.ivm_retraction_merge(
            snapshot, delta, ["k"], "n", ["sv"], [("median", "sv")], delta
        )


# --- l-diversity audit ------------------------------------------------


def test_l_diversity_flags_homogeneous_classes(spark):
    """A k-anonymous class whose members all share the sensitive value
    must be flagged; diverse classes must not; all-null sensitive counts
    0 distinct (flagged)."""
    from census_data_pipeline_spark.operators.quality import (
        l_diversity_audit,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, "flu"), ("a", 1, "flu"), ("a", 1, "flu"),  # homogeneous
            ("b", 2, "flu"), ("b", 2, "cold"), ("b", 2, "ok"),  # diverse
            ("c", 3, None), ("c", 3, None),                     # all-null
        ],
        "seg string, grp int, dx string",
    )
    out = {
        (r.seg, r.grp): (r.class_size, r.n_distinct_sensitive)
        for r in l_diversity_audit(df, ["seg", "grp"], "dx", l=2).collect()
    }
    assert out == {("a", 1): (3, 1), ("c", 3): (2, 0)}
    with pytest.raises(ValueError, match="l must be"):
        l_diversity_audit(df, ["seg"], "dx", l=1)


# --- Holt-Winters forecast (VERDICT r6 #9 / r7 #9) --------------------


def test_holt_winters_recovers_trend_and_seasonality(spark):
    """On a NOISELESS additive series (level + trend + period-4
    seasonal), enough smoothing rounds must forecast the true
    continuation to within a tight tolerance — and keys shorter than
    two seasons are dropped."""
    from census_data_pipeline_spark.operators import forecast

    m, n = 4, 40
    season = [3.0, -1.0, -2.0, 0.0]
    rows = [("k", t, 10.0 + 0.5 * t + season[(t - 1) % m])
            for t in range(1, n + 1)]
    rows += [("short", t, 1.0) for t in range(1, m + 1)]  # < 2m: dropped
    df = spark.createDataFrame(rows, "k string, t int, y double")
    out = forecast.holt_winters_forecast(
        df, ["k"], "t", "y", m=m, alpha=0.3, beta=0.1, gamma=0.3,
        horizon=8,
    )
    got = {(r.k, r.h): r.forecast for r in out.collect()}
    assert {k for k, _ in got} == {"k"}
    for h in range(1, 9):
        true = 10.0 + 0.5 * (n + h) + season[(n + h - 1) % m]
        assert abs(got[("k", h)] - true) < 0.15, (h, got[("k", h)], true)


def test_holt_winters_guards(spark):
    from census_data_pipeline_spark.operators import forecast

    df = spark.createDataFrame([("k", 1, 1.0)], "k string, t int, y double")
    with pytest.raises(ValueError, match="season length"):
        forecast.holt_winters_forecast(df, ["k"], "t", "y", m=1)
    with pytest.raises(ValueError, match="horizon"):
        forecast.holt_winters_forecast(df, ["k"], "t", "y", horizon=0)


# --- grouped survival + log-rank (VERDICT r6 #8 / r7 #8) --------------

# small clinical-trial-style two-cohort set; reference constants below
# were computed with an independent plain-Python loop (same risk-set
# convention: censored at t stays at risk at t)
_SURV_DATA = [
    ("a", 6, 1), ("a", 6, 1), ("a", 6, 0), ("a", 7, 1), ("a", 10, 0),
    ("a", 13, 1), ("a", 16, 1), ("a", 22, 0), ("a", 23, 1),
    ("b", 1, 1), ("b", 1, 1), ("b", 2, 1), ("b", 2, 1), ("b", 3, 1),
    ("b", 4, 1), ("b", 5, 0), ("b", 8, 1), ("b", 11, 1), ("b", 12, 0),
]


@pytest.fixture()
def surv_df(spark):
    return spark.createDataFrame(
        _SURV_DATA, "cohort string, duration long, observed int"
    )


def test_kaplan_meier_grouped_textbook(surv_df):
    from census_data_pipeline_spark.operators import survival

    out = {
        (r.cohort, r.duration): (r.n_risk, r.n_events, r.survival)
        for r in survival.kaplan_meier_grouped(surv_df).collect()
    }
    # cohort a spot checks (hand-computed product-limit values)
    assert out[("a", 6)] == (9, 2, pytest.approx(0.777778))
    assert out[("a", 7)] == (6, 1, pytest.approx(0.648148))
    assert out[("a", 10)] == (5, 0, pytest.approx(0.648148))  # censor only
    assert out[("a", 23)] == (1, 1, pytest.approx(0.0))
    # cohorts are independent: b's curve unaffected by a's exits
    assert out[("b", 1)] == (10, 2, pytest.approx(0.8))
    # every cohort has its own complete curve
    assert {c for c, _ in out} == {"a", "b"}


def test_logrank_textbook_and_symmetry(spark, surv_df):
    from census_data_pipeline_spark.operators import survival

    row = survival.logrank_test(surv_df).collect()[0]
    assert (row.cohort_a, row.cohort_b) == ("a", "b")
    assert row.observed_a == 6
    assert row.expected_a == pytest.approx(9.707382, abs=1e-6)
    assert row.chi2 == pytest.approx(5.662395, abs=1e-6)
    assert bool(row.significant) is True  # chi2 > 3.8415
    # identical curves -> chi2 ~ 0, not significant
    same = spark.createDataFrame(
        [("a", d, o) for _, d, o in _SURV_DATA]
        + [("b", d, o) for _, d, o in _SURV_DATA],
        "cohort string, duration long, observed int",
    )
    r2 = survival.logrank_test(same).collect()[0]
    assert r2.chi2 == pytest.approx(0.0, abs=1e-9)
    assert bool(r2.significant) is False


def test_logrank_rejects_non_two_cohorts(spark):
    from census_data_pipeline_spark.operators import survival

    df = spark.createDataFrame(
        [("a", 1, 1), ("b", 2, 1), ("c", 3, 0)],
        "cohort string, duration long, observed int",
    )
    with pytest.raises(ValueError, match="two-cohort"):
        survival.logrank_test(df)


# --- 5. write_bucketed: db-qualified heal + EXTERNAL protection -------


def test_write_bucketed_db_qualified_heals_right_directory(spark):
    """An orphaned warehouse dir for db.tbl lives at <warehouse>/db.db/
    tbl; healing must clear THAT path and must never touch an unrelated
    default-database directory named <warehouse>/tbl."""
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    db_orphan = os.path.join(warehouse, "r8db.db", "t8")
    decoy = os.path.join(warehouse, "t8")
    decoy_file = os.path.join(decoy, "keep.txt")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    try:
        spark.sql("CREATE DATABASE IF NOT EXISTS r8db")
        spark.sql("DROP TABLE IF EXISTS r8db.t8")
        os.makedirs(db_orphan, exist_ok=True)
        with open(os.path.join(db_orphan, "part-stale.parquet"), "wb") as f:
            f.write(b"stale")
        os.makedirs(decoy, exist_ok=True)
        with open(decoy_file, "w") as f:
            f.write("unrelated user data")
        bucketing.write_bucketed(df, "r8db.t8", "k", 4)
        assert bucketing.read_table(spark, "r8db.t8").count() == 20
        assert os.path.exists(decoy_file), "healing deleted an unrelated dir"
    finally:
        spark.sql("DROP TABLE IF EXISTS r8db.t8")
        spark.sql("DROP DATABASE IF EXISTS r8db CASCADE")
        import shutil

        shutil.rmtree(decoy, ignore_errors=True)


def test_write_bucketed_never_deletes_external_table_data(spark, tmp_path):
    """DROP TABLE on an EXTERNAL table intentionally preserves its data,
    and its location may be a shared user directory — overwrite-by-name
    must leave the external files on disk (ADVICE r7)."""
    ext_dir = str(tmp_path / "ext_data")
    spark.range(5).select(F.col("id").alias("k")).write.parquet(ext_dir)
    n_files_before = len(os.listdir(ext_dir))
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("v")
    )
    try:
        spark.sql("DROP TABLE IF EXISTS r8_ext")
        # USING parquet + LOCATION = an unmanaged (EXTERNAL) table in the
        # in-memory catalog (no Hive support needed)
        spark.sql(
            f"CREATE TABLE r8_ext (k bigint) USING parquet "
            f"LOCATION '{ext_dir}'"
        )
        bucketing.write_bucketed(df, "r8_ext", "k", 4)
        assert bucketing.read_table(spark, "r8_ext").count() == 10
        assert os.path.isdir(ext_dir), "external table data dir deleted"
        assert len(os.listdir(ext_dir)) == n_files_before
    finally:
        spark.sql("DROP TABLE IF EXISTS r8_ext")


# --- decision tree (histogram split finding) -------------------------------


def _tree_rows(out):
    return {r.node: r for r in out.collect()}


def test_tree_recovers_planted_splits(spark):
    """y = 1 iff x1 > 0.5, else 1 iff x2 > 0.7 — the greedy root must
    split on x1 near 0.5 and the LEFT child on x2 near 0.7, with pure
    leaves (deterministic grid, no RNG)."""
    from census_data_pipeline_spark.functions import classify

    pts = [(i / 100.0, j / 10.0) for i in range(101) for j in range(11)]
    df = spark.createDataFrame(pts, "x1 double, x2 double")
    out = classify.decision_tree_train(
        df,
        F.when(F.col("x1") > 0.5, F.lit(1)).otherwise(
            F.when(F.col("x2") > 0.7, F.lit(1)).otherwise(F.lit(0))
        ),
        [("x1", F.col("x1")), ("x2", F.col("x2"))],
        bins=16,
        depth=2,
    )
    rows = _tree_rows(out)
    root = rows[1]
    assert root.kind == "split" and root.feature == "x1"
    assert abs(root.threshold - 0.5) < 1.0 / 16 + 1e-9
    left = rows[2]
    assert left.kind == "split" and left.feature == "x2"
    assert abs(left.threshold - 0.7) < 1.0 / 16 + 1e-9
    # left-left leaf (x1<=t, x2<=0.7) is pure negative; left-right pure pos
    assert rows[4].pos == 0 and rows[4].predict == 0
    assert rows[5].pos == rows[5].n and rows[5].predict == 1
    # the root's right side is almost-pure positive (only the x1 == 0.5
    # boundary column, which falls in the right child, is mixed) and its
    # own right child is pure
    assert rows[3].pos_rate > 0.95 and rows[3].predict == 1
    assert rows[7].pos == rows[7].n and rows[7].predict == 1


def test_tree_pure_label_is_single_leaf(spark):
    """All-same label: no candidate split has two non-empty children
    with differing impurity gain... every split still exists but gini
    is 0 everywhere; the tree must stay well-formed and every node
    predict the constant label."""
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame(
        [(float(i),) for i in range(50)], "x double"
    )
    out = classify.decision_tree_train(
        df, F.lit(1), [("x", F.col("x"))], bins=8, depth=2
    )
    rows = _tree_rows(out)
    assert all(r.predict == 1 for r in rows.values())
    assert all(r.pos == r.n for r in rows.values())


def test_tree_constant_feature_is_leaf(spark):
    """A constant feature can never split (every row in bin 0, no valid
    boundary) — with only constant features the root is a leaf with the
    full-row stats."""
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame(
        [(1.0, i % 3 == 0) for i in range(30)], "x double, y boolean"
    )
    out = classify.decision_tree_train(
        df,
        F.col("y").cast("int"),
        [("x", F.col("x"))],
        bins=8,
        depth=2,
    )
    rows = _tree_rows(out)
    assert list(rows) == [1]
    root = rows[1]
    assert root.kind == "leaf" and root.n == 30 and root.pos == 10
    assert root.predict == 0


def test_tree_null_rows_dropped_and_guards(spark):
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame(
        [(1.0, 1), (None, 0), (2.0, None), (3.0, 1), (4.0, 0)],
        "x double, y int",
    )
    out = classify.decision_tree_train(
        df, F.col("y"), [("x", F.col("x"))], bins=4, depth=1
    )
    assert _tree_rows(out)[1].n == 3  # null feature + null label dropped
    with pytest.raises(ValueError, match="depth"):
        classify.decision_tree_train(df, F.col("y"), [("x", F.col("x"))],
                                     depth=0)
    with pytest.raises(ValueError, match="bins"):
        classify.decision_tree_train(df, F.col("y"), [("x", F.col("x"))],
                                     bins=1)


def test_tree_confusion_counts_match_tree_leaves(spark):
    """The confusion cells must be consistent with the tree itself:
    total = root n, per-predicted totals = sums of leaf n with that
    majority label, and on the planted-split grid the tree separates
    perfectly (off-diagonal cells absent)."""
    from census_data_pipeline_spark.functions import classify

    pts = [(i / 100.0, j / 10.0) for i in range(101) for j in range(11)]
    df = spark.createDataFrame(pts, "x1 double, x2 double")
    label = F.when(F.col("x1") >= 0.6, F.lit(1)).otherwise(F.lit(0))
    feats = [("x1", F.col("x1"))]
    conf = {
        (r.actual, r.predicted): r.cnt
        for r in classify.decision_tree_confusion(
            df, label, feats, bins=10, depth=1
        ).collect()
    }
    # bins=10 puts the label boundary on the 0.6 bin edge — but IEEE
    # 0.6/0.1 = 5.999…, so the x1 == 0.6 column floors into bin 5 and
    # goes LEFT: the best split misclassifies exactly that column (11
    # rows) and nothing else. Both engines bin identically; this pins
    # the documented float-binning semantics, not a defect.
    assert conf[(0, 0)] == 60 * 11 and conf[(1, 1)] == 40 * 11
    assert conf[(1, 0)] == 11 and (0, 1) not in conf
    tree = {
        r.node: r
        for r in classify.decision_tree_train(
            df, label, feats, bins=10, depth=1
        ).collect()
    }
    assert sum(v for v in conf.values()) == tree[1].n


# --- gradient-boosted stumps (LS_Boost over the histogram machinery) --


def test_boost_recovers_planted_step_and_shrinks_rmse(spark):
    """Target = 2·step(x1 ≥ 0.6) + step(x2 ≥ 0.3) on a deterministic
    grid: round 1 must split x1 at the 0.6 bin edge (twice the
    variance), a later round must pick up x2 near 0.3, and train RMSE
    must fall well below the target's std."""
    from census_data_pipeline_spark.functions import classify

    pts = [(i / 100.0, j / 10.0) for i in range(101) for j in range(11)]
    df = spark.createDataFrame(pts, "x1 double, x2 double")
    target = (
        F.when(F.col("x1") >= 0.6, F.lit(2.0)).otherwise(F.lit(0.0))
        + F.when(F.col("x2") >= 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    feats = [("x1", F.col("x1")), ("x2", F.col("x2"))]
    rows = classify.boost_stumps_train(
        df, target, feats, rounds=6, bins=10, lr=0.5
    ).collect()
    by_round = {r["round"]: r for r in rows}
    assert by_round[0].feature == "base"
    assert by_round[1].feature == "x1"
    assert abs(by_round[1].threshold - 0.6) < 0.1 + 1e-9
    assert any(
        r.feature == "x2" and abs(r.threshold - 0.3) < 0.1 + 1e-9
        for r in rows if r["round"] >= 1
    )
    # stump directions: left below the step, right above
    assert by_round[1].left_value < 0 < by_round[1].right_value
    # RMSE after 6 rounds with lr=0.5 must be far below the target std
    import math

    ys = [2.0 * (x1 >= 0.6) + 1.0 * (x2 >= 0.3) for x1, x2 in pts]
    mean = sum(ys) / len(ys)
    std = math.sqrt(sum((y - mean) ** 2 for y in ys) / len(ys))
    assert rows[0].train_rmse < 0.35 * std


def test_boost_constant_target_zero_stumps(spark):
    """A constant target leaves zero residuals: every stump's values are
    0 and RMSE is exactly 0 — the degenerate path stays well-formed."""
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame(
        [(float(i),) for i in range(40)], "x double"
    )
    rows = classify.boost_stumps_train(
        df, F.lit(5.0), [("x", F.col("x"))], rounds=3, bins=8
    ).collect()
    assert all(r.train_rmse == 0.0 for r in rows)
    for r in rows:
        if r["round"] >= 1:
            assert r.left_value == 0.0 and r.right_value == 0.0


def test_boost_constant_feature_no_stump_rows(spark):
    """With only constant features no valid split exists: the model is
    just the base row and residuals pass through every round intact
    (the left-join update), so RMSE equals the target's std."""
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame(
        [(1.0, float(i % 2)) for i in range(40)], "x double, y double"
    )
    rows = classify.boost_stumps_train(
        df, F.col("y"), [("x", F.col("x"))], rounds=3, bins=8
    ).collect()
    assert [r["round"] for r in rows] == [0]
    assert rows[0].train_rmse == 0.5  # std of a fair 0/1 column


def test_boost_guards(spark):
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    with pytest.raises(ValueError, match="rounds"):
        classify.boost_stumps_train(df, F.col("y"), [("x", F.col("x"))],
                                    rounds=0)
    with pytest.raises(ValueError, match="bins"):
        classify.boost_stumps_train(df, F.col("y"), [("x", F.col("x"))],
                                    bins=1)


# --- personalized PageRank / TrustRank --------------------------------


def test_trustrank_mass_confined_and_conserved(spark):
    """Two disconnected chains; seeds only in the first: every node of
    the second component must decay to 0, total mass must stay 1 (the
    dangling redistribution returns to the seeds), and the seed must
    out-rank its downstream nodes."""
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    out = {r.id: r.rank
           for r in graph.pagerank(e, iterations=8,
                                   personalization=seeds).collect()}
    assert out["x"] == 0.0 and out["y"] == 0.0
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out["a"] > out["b"] > 0 and out["c"] > 0


def test_trustrank_no_seed_in_graph_all_zero(spark):
    """A seed set disjoint from the graph degrades to the all-zero
    teleport (documented), not a divide-by-zero artifact."""
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("zzz",)], "id string")
    out = {r.id: r.rank
           for r in graph.pagerank(e, iterations=3,
                                   personalization=seeds).collect()}
    assert out == {"a": 0.0, "b": 0.0}


def test_trustrank_uniform_path_unchanged(spark):
    """personalization=None must keep the original uniform arithmetic:
    on a symmetric 2-cycle both variants give 0.5/0.5, and the uniform
    result equals seed-everything personalization."""
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    uni = {r.id: r.rank for r in graph.pagerank(e, iterations=5).collect()}
    assert uni["a"] == pytest.approx(0.5) and uni["b"] == pytest.approx(0.5)
    allseeds = spark.createDataFrame([("a",), ("b",)], "id string")
    per = {r.id: r.rank
           for r in graph.pagerank(e, iterations=5,
                                   personalization=allseeds).collect()}
    assert per["a"] == pytest.approx(0.5) and per["b"] == pytest.approx(0.5)


# --- nDCG@k ranking evaluation ----------------------------------------


def test_ndcg_perfect_and_degraded_rankings(spark):
    """Hand-built corpus where one term's BM25 ranking is provably ideal
    (higher tf => higher score, equal lengths) -> nDCG = 1; a term
    absent everywhere -> dcg = idcg = 0 -> ndcg = 0 (defined, not NaN);
    hand-computed idcg for the graded column."""
    from census_data_pipeline_spark.functions import search

    rows = [
        (1, "apple apple apple pad pad"),   # tf(apple)=3 -> rel 3
        (2, "apple apple pad pad pad"),     # rel 2
        (3, "apple pad pad pad pad"),       # rel 1
        (4, "pad pad pad pad pad"),         # rel 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: r for r in search.ndcg_for_terms(
        df, ["apple", "zzz"], k=3).collect()}
    import math

    ideal = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert out["apple"].ndcg == pytest.approx(1.0)
    assert out["apple"].idcg_at_k == pytest.approx(ideal, abs=2e-6)
    assert out["zzz"].dcg_at_k == 0.0 and out["zzz"].ndcg == 0.0


def test_ndcg_detects_length_normalization_demotion(spark):
    """BM25's length normalization demotes a long document that carries
    the highest raw tf — nDCG@k must drop below 1 exactly because the
    graded-ideal order disagrees with the BM25 order."""
    from census_data_pipeline_spark.functions import search

    rows = [
        (1, "apple " * 4 + "pad " * 396),   # tf 4 but 400 tokens long
        (2, "apple apple apple"),           # tf 3, short
        (3, "apple pad"),                   # tf 1
    ]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    out = {r.term: r for r in search.ndcg_for_terms(
        df, ["apple"], k=2, rel_cap=50).collect()}
    r = out["apple"]
    assert r.ndcg < 1.0 and r.dcg_at_k < r.idcg_at_k


def test_ndcg_guards(spark):
    from census_data_pipeline_spark.functions import search

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="terms"):
        search.ndcg_for_terms(df, [])
    with pytest.raises(ValueError, match="k must"):
        search.ndcg_for_terms(df, ["a"], k=0)


# --- split-conformal forecast bands -----------------------------------


def _hourly_series(spark, n_keys=1, hours=96, amp=10.0):
    """Deterministic seasonal series builder: y = amp·(1 + sin-ish
    periodic term via modular arithmetic), one row per (key, t)."""
    rows = []
    for k in range(n_keys):
        for t in range(1, hours + 1):
            y = amp * (1.0 + ((t % 24) / 24.0)) + k
            rows.append((f"k{k}", t, y))
    return spark.createDataFrame(rows, "key string, t int, y double")


def test_conformal_bands_contain_forecast_and_calibrate(spark):
    """Bands must be symmetric around the forecast with the per-key
    radius equal to the ceil((H+1)·cov)-th smallest backtest error, and
    on a noiseless periodic series (near-zero backtest error) the bands
    must be tight."""
    from census_data_pipeline_spark.operators import forecast

    s = _hourly_series(spark, n_keys=2, hours=96)
    out = forecast.holt_winters_conformal(
        s, ["key"], "t", "y", m=24, horizon=24, coverage=0.8
    ).collect()
    assert len(out) == 2 * 24
    bt = forecast.holt_winters_backtest(
        s, ["key"], "t", "y", m=24, horizon=24
    ).collect()
    import math

    for key in ("k0", "k1"):
        errs = sorted(r.abs_err for r in bt if r.key == key)
        h = len(errs)
        expected_q = errs[min(math.ceil((h + 1) * 0.8), h) - 1]
        for r in out:
            if r.key != key:
                continue
            assert r.qhat == expected_q
            assert r.lo == pytest.approx(r.forecast - r.qhat, abs=1e-6)
            assert r.hi == pytest.approx(r.forecast + r.qhat, abs=1e-6)
        # noiseless periodic series -> tiny calibration errors
        assert expected_q < 0.5


def test_conformal_short_series_dropped_and_guard(spark):
    from census_data_pipeline_spark.operators import forecast

    s = _hourly_series(spark, n_keys=1, hours=60)  # < 2m + horizon
    out = forecast.holt_winters_conformal(
        s, ["key"], "t", "y", m=24, horizon=24
    ).collect()
    assert out == []
    with pytest.raises(ValueError, match="coverage"):
        forecast.holt_winters_conformal(
            s, ["key"], "t", "y", coverage=1.5
        )


# --- logreg calibration bins ------------------------------------------


def test_calibration_constant_classifier_is_perfect(spark):
    """With a label-independent feature (x flips every 4 rows, y fires
    once per 4-row block — P(y|x) = 0.25 for both x values) the fitted
    model predicts ~the base rate for every row: one occupied bin whose
    mean prediction matches the observed positive rate (gap ≈ 0) and
    whose n is the corpus size."""
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame(
        [(float((i // 4) % 2), i % 4 == 0) for i in range(80)],
        "x double, y boolean",
    )
    rows = classify.logreg_calibration(
        df, F.col("y").cast("double"), [("x", F.col("x"))], iterations=24
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n == 80 and r.frac_pos == pytest.approx(0.25)
    assert r.gap == pytest.approx(abs(r.mean_pred - 0.25), abs=1e-6)
    assert r.gap < 0.05  # GD converges toward the base rate


def test_calibration_separable_data_polarizes_bins(spark):
    """On linearly separable data the model pushes probabilities toward
    the extremes: the low bins must be all-negative, the high bins
    all-positive, and every occupied bin consistent (frac_pos in
    {0, 1})."""
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame(
        [(float(i), i >= 50) for i in range(100)], "x double, y boolean"
    )
    rows = classify.logreg_calibration(
        df, F.col("y").cast("double"), [("x", F.col("x"))], iterations=8
    ).collect()
    assert len(rows) >= 2
    for r in rows:
        if r.bin <= 3:
            assert r.frac_pos == 0.0
        if r.bin >= 6:
            assert r.frac_pos == 1.0
    assert sum(r.n for r in rows) == 100
    with pytest.raises(ValueError, match="n_bins"):
        classify.logreg_calibration(
            df, F.col("y").cast("double"), [("x", F.col("x"))], n_bins=1
        )


# --- grid DBSCAN -------------------------------------------------------


def test_dbscan_textbook_roles_and_clusters(spark):
    """Two tight 4-point squares far apart + one point hanging off the
    first square + one isolated point: the squares are two distinct
    all-core clusters labeled by their min id, the hanger is a border
    of the first, the loner is noise."""
    from census_data_pipeline_spark.operators.geo import dbscan_grid

    pts = [
        (1, 0.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 0.0), (4, 1.0, 1.0),
        (10, 100.0, 100.0), (11, 100.0, 101.0),
        (12, 101.0, 100.0), (13, 101.0, 101.0),
        (5, 2.4, 0.0),       # within 1.5 of point 3 only -> border
        (99, 50.0, 50.0),    # noise
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = {r.id: (r.role, r.cluster)
           for r in dbscan_grid(df, eps=1.5, min_pts=4).collect()}
    for i in (1, 2, 3, 4):
        assert out[i] == ("core", 1)
    for i in (10, 11, 12, 13):
        assert out[i] == ("core", 10)
    assert out[5] == ("border", 1)
    assert out[99] == ("noise", None)


def test_dbscan_cross_cell_pairs_are_found(spark):
    """Two points eps-close but in DIFFERENT grid cells (straddling a
    cell boundary) must still pair up — the 3×3 block join is exact.
    With min_pts=2 they form one two-core cluster."""
    from census_data_pipeline_spark.operators.geo import dbscan_grid

    df = spark.createDataFrame(
        [(1, 0.95, 0.0), (2, 1.05, 0.0)], "id long, x double, y double"
    )
    out = {r.id: (r.role, r.cluster)
           for r in dbscan_grid(df, eps=1.0, min_pts=2).collect()}
    assert out == {1: ("core", 1), 2: ("core", 1)}


def test_dbscan_singleton_core_and_guards(spark):
    """min_pts=1 makes every point core; an isolated core with no core
    neighbor is its own singleton cluster."""
    from census_data_pipeline_spark.operators.geo import dbscan_grid

    df = spark.createDataFrame(
        [(7, 0.0, 0.0), (8, 10.0, 10.0)], "id long, x double, y double"
    )
    out = {r.id: (r.role, r.cluster)
           for r in dbscan_grid(df, eps=1.0, min_pts=1).collect()}
    assert out == {7: ("core", 7), 8: ("core", 8)}
    import pytest as _pt

    with _pt.raises(ValueError, match="eps"):
        dbscan_grid(df, eps=0.0, min_pts=2)
    with _pt.raises(ValueError, match="min_pts"):
        dbscan_grid(df, eps=1.0, min_pts=0)


# --- exact AUC over the score histogram --------------------------------


def test_auc_separable_ties_and_degenerate(spark):
    """Linearly separable data -> AUC 1; a label-independent feature
    whose two score groups each hold a 50/50 label mix -> the
    tie-corrected AUC equals the hand rank-sum; single-class input ->
    NULL (undefined, not a crash)."""
    from census_data_pipeline_spark.functions import classify

    sep = spark.createDataFrame(
        [(float(i), i >= 50) for i in range(100)], "x double, y boolean"
    )
    r = classify.logreg_auc(
        sep, F.col("y").cast("double"), [("x", F.col("x"))], iterations=8
    ).collect()[0]
    assert (r.n_pos, r.n_neg) == (50, 50) and r.auc == 1.0

    # x in {0,1} independent of y (25% positive in both groups): every
    # pos/neg pair is either tied (same score) or split across the two
    # scores; hand U = nb*pos + pos*neg/2 summed over both cells.
    ind = spark.createDataFrame(
        [(float((i // 4) % 2), i % 4 == 0) for i in range(80)],
        "x double, y boolean",
    )
    r2 = classify.logreg_auc(
        ind, F.col("y").cast("double"), [("x", F.col("x"))], iterations=4
    ).collect()[0]
    # with symmetric groups the ranking carries no information: AUC 0.5
    assert r2.auc == pytest.approx(0.5, abs=1e-6)

    mono = spark.createDataFrame(
        [(float(i), True) for i in range(10)], "x double, y boolean"
    )
    r3 = classify.logreg_auc(
        mono, F.col("y").cast("double"), [("x", F.col("x"))], iterations=2
    ).collect()[0]
    assert r3.n_neg == 0 and r3.auc is None


def test_holdout_eval_generalizes_on_separable_data(spark):
    """A linearly separable rule generalizes: train on ~4/5 of the
    rows, held-out accuracy and AUC must both be 1.0, and the fold
    sizes must add up; train-statistics standardization means the test
    fold's own distribution never leaks into scoring."""
    from census_data_pipeline_spark.functions import classify

    df = spark.createDataFrame(
        [(i, float(i % 200), (i % 200) >= 100) for i in range(1000)],
        "id long, x double, y boolean",
    )
    test_pred = F.substring(
        F.md5(F.col("id").cast("string")), 1, 1
    ).isin("0", "1", "2")
    r = classify.logreg_holdout_eval(
        df, F.col("y").cast("double"), [("x", F.col("x"))], test_pred,
        iterations=8,
    ).collect()[0]
    assert r.n_train + r.n_test == 1000 and r.n_test > 100
    assert r.test_accuracy > 0.97  # boundary rows may sit at margin 0
    assert r.test_auc == 1.0


def test_tree_holdout_routes_unseen_rows_correctly(spark):
    """A separable rule must generalize through the tree: the held-out
    confusion is diagonal; and test rows OUTSIDE the train feature range
    (clamped into edge bins by the train min/width) still route to a
    training leaf instead of vanishing."""
    from census_data_pipeline_spark.functions import classify

    # train range x in [0, 199]; ids hashed out include arbitrary rows,
    # plus two planted out-of-range points via id >= 1000
    rows = [(i, float(i % 200), (i % 200) >= 100) for i in range(1000)]
    rows += [(1000, -50.0, False), (1001, 500.0, True)]
    df = spark.createDataFrame(rows, "id long, x double, y boolean")
    test_pred = (
        F.substring(F.md5(F.col("id").cast("string")), 1, 1)
        .isin("0", "1", "2") | (F.col("id") >= 1000)
    )
    conf = {
        (r.actual, r.predicted): r.cnt
        for r in classify.decision_tree_holdout(
            df, F.col("y").cast("int"), [("x", F.col("x"))], test_pred,
            bins=10, depth=1,
        ).collect()
    }
    assert (0, 1) not in conf and (1, 0) not in conf  # diagonal
    n_test = sum(conf.values())
    assert n_test > 100  # out-of-range rows included, none dropped


def test_boost_holdout_generalizes_additive_target(spark):
    """An additive two-step target learned on 4/5 of the grid must
    carry to the held-out fold: test RMSE lands near train RMSE and far
    below the target's std; folds sum to the corpus."""
    import math

    from census_data_pipeline_spark.functions import classify

    pts = [(i, i / 100.0 % 1.0, (i // 7) % 11 / 10.0) for i in range(1100)]
    df = spark.createDataFrame(pts, "id long, x1 double, x2 double")
    target = (
        F.when(F.col("x1") >= 0.6, F.lit(2.0)).otherwise(F.lit(0.0))
        + F.when(F.col("x2") >= 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    test_pred = F.substring(
        F.md5(F.col("id").cast("string")), 1, 1
    ).isin("0", "1", "2")
    r = classify.boost_stumps_holdout(
        df, target, [("x1", F.col("x1")), ("x2", F.col("x2"))], test_pred,
        rounds=6, bins=10, lr=0.5,
    ).collect()[0]
    assert r.n_train + r.n_test == 1100 and r.n_test > 100
    ys = [2.0 * (x1 >= 0.6) + 1.0 * (x2 >= 0.3) for _, x1, x2 in pts]
    mean = sum(ys) / len(ys)
    std = math.sqrt(sum((y - mean) ** 2 for y in ys) / len(ys))
    assert r.test_rmse < 0.5 * std
    assert abs(r.test_rmse - r.train_rmse) < 0.25 * std


# --- Neyman-allocation stratified sampling -----------------------------


def test_neyman_allocation_and_caps(spark):
    """Hand-checkable allocation: two strata with equal counts but 3:1
    stddev ratio split a budget of 8 as 6:2; a zero-variance stratum
    gets nothing while weights exist; a tiny high-variance stratum is
    capped at its population; all-zero variance degrades to
    proportional."""
    from census_data_pipeline_spark.functions import sampling

    rows = []
    # stratum A: values +-3 around 0 (sd 3), 10 rows
    rows += [("A", i, 3.0 if i % 2 else -3.0) for i in range(10)]
    # stratum B: values +-1 (sd 1), 10 rows
    rows += [("B", 100 + i, 1.0 if i % 2 else -1.0) for i in range(10)]
    # stratum C: constant (sd 0), 10 rows
    rows += [("C", 200 + i, 5.0) for i in range(30)]
    df = spark.createDataFrame(rows, "s string, id long, v double")
    out = sampling.neyman_sample(df, "s", "v", "id", budget=8).collect()
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r)
    assert len(by.get("A", [])) == 6 and len(by.get("B", [])) == 2
    assert "C" not in by
    assert all(r.alloc == 6 for r in by["A"])

    # cap: stratum D has sd 10 but only 2 rows
    rows2 = [("D", 1, 100.0), ("D", 2, -100.0)] + [
        ("E", 10 + i, 1.0 if i % 2 else -1.0) for i in range(20)
    ]
    df2 = spark.createDataFrame(rows2, "s string, id long, v double")
    out2 = sampling.neyman_sample(df2, "s", "v", "id", budget=10).collect()
    d_rows = [r for r in out2 if r.stratum == "D"]
    assert len(d_rows) == 2  # capped at the population

    # all-zero variance -> proportional
    rows3 = [("X", i, 1.0) for i in range(30)] + [
        ("Y", 100 + i, 2.0) for i in range(10)
    ]
    df3 = spark.createDataFrame(rows3, "s string, id long, v double")
    out3 = sampling.neyman_sample(df3, "s", "v", "id", budget=4).collect()
    cnt = {}
    for r in out3:
        cnt[r.stratum] = cnt.get(r.stratum, 0) + 1
    assert cnt == {"X": 3, "Y": 1}
    import pytest as _pt

    with _pt.raises(ValueError, match="budget"):
        sampling.neyman_sample(df3, "s", "v", "id", budget=0)


def test_ht_estimate_exact_on_census_and_consistent(spark):
    """When the budget covers every row the 'sample' is a census and the
    HT estimate must equal the true total exactly (err 0 per stratum
    and on the rollup); with a partial draw the rollup row must equal
    the sum of the per-stratum rounded estimates."""
    from census_data_pipeline_spark.functions import sampling

    rows = [("A", i, float(i)) for i in range(10)] + [
        ("B", 100 + i, float(2 * i)) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "s string, id long, v double")
    # an over-budget draw caps every stratum at its population -> census
    census = sampling.ht_estimate(df, "s", "v", "id", budget=32).collect()
    for r in census:
        assert r.err == 0.0 and r.n_samp == r.n_pop
    part = {r.stratum: r for r in sampling.ht_estimate(
        df, "s", "v", "id", budget=6).collect()}
    allr = part["<all>"]
    assert allr.n_samp == 6
    assert allr.est_total == pytest.approx(
        round(sum(r.est_total for k, r in part.items() if k != "<all>"), 6)
    )

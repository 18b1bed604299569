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

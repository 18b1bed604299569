#!/usr/bin/env python
"""Local-tail vs distributed parity harness (r14 — VERDICT r13 #7's
"parity rows"): for every operator with a bounded local tail, run the
SAME sf0.1-derived input through the gated path (default
local_tail_max — the tail fires at this scale) and through the forced
distributed path (local_tail_max=0), and compare the collected row
multisets EXACTLY. Emits one JSON line {"parity": {op: "equal" |
"DIFF(...)"}} for SCALE_REHEARSAL_100X_r<N>.json to embed.

The float-valued tails (pagerank/hits/weighted pagerank) rest on the
last-ulp-absorbed-by-rounding argument — exact equality here is the
strongest possible check of it on this input."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from census_data_pipeline_spark.functions import dedup, graph  # noqa: E402
from census_data_pipeline_spark.session import get_spark  # noqa: E402
from census_data_pipeline_spark.sources.catalog import (  # noqa: E402
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="tail_parity")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    e = j.select("o_custkey", "l_suppkey").distinct().select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    ew = j.groupBy(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    ).agg(F.sum("l_quantity").cast("double").alias("w"))
    docs = load_table(spark, SF_DIR, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).select(
        "id_a", "id_b"
    )

    lpa = graph.label_propagation(e, iterations=5, broadcast_labels=True)

    cases = {
        "pagerank": lambda lt: graph.pagerank(
            e, iterations=5, broadcast_ranks=True, local_tail_max=lt),
        "hits": lambda lt: graph.hits_scores(
            e, iterations=5, broadcast_scores=True, local_tail_max=lt),
        "components": lambda lt: graph.connected_components(
            e, local_tail_max=lt),
        "label_propagation": lambda lt: graph.label_propagation(
            e, iterations=5, broadcast_labels=True, local_tail_max=lt),
        "lpa_weighted": lambda lt: graph.label_propagation(
            ew, iterations=5, broadcast_labels=True, weight_col="w",
            local_tail_max=lt),
        "weighted_pagerank": lambda lt: graph.weighted_pagerank(
            ew, iterations=5, weight_col="w", local_tail_max=lt),
        "louvain_move": lambda lt: graph.louvain_local_move(
            e, rounds=4, init_labels=lpa, local_tail_max=lt),
        "louvain_multilevel": lambda lt: graph.louvain_multilevel(
            e, levels=4, rounds=10, local_tail_max=lt),
        "leiden": lambda lt: graph.leiden(
            e, levels=4, rounds=14, local_tail_max=lt),
        "modularity": lambda lt: graph.modularity(
            e, lpa, local_tail_max=lt),
        "conductance": lambda lt: graph.conductance(
            e, graph.label_propagation(
                e, iterations=5, broadcast_labels=True),
            local_tail_max=lt),
        "coreness": lambda lt: graph.coreness(e, local_tail_max=lt),
        "dup_clusters_label": lambda lt: dedup.dup_clusters(
            pairs, local_tail_max=lt),
        "dup_clusters_star": lambda lt: dedup.dup_clusters(
            pairs, algorithm="star", local_tail_max=lt),
    }
    def r6(row):
        return tuple(
            round(v, 6) if isinstance(v, float) else v for v in row
        )

    out = {}
    for name, fn in cases.items():
        try:
            tail = sorted(map(tuple, fn(2_000_000).collect()))
            dist = sorted(map(tuple, fn(0).collect()))
            if tail == dist:
                out[name] = "equal"
            elif sorted(map(r6, tail)) == sorted(map(r6, dist)):
                # the float tails' documented contract: raw doubles may
                # differ in the last ulp (different accumulation order);
                # every QUERY consuming them rounds to 6 dp, where the
                # two paths agree — report the worst raw delta so a
                # boundary-adjacent drift would be visible here first
                worst = max(
                    abs(a - b)
                    for ra, rb in zip(tail, dist)
                    for a, b in zip(ra, rb)
                    if isinstance(a, float)
                )
                out[name] = f"equal_at_6dp (max raw |Δ| = {worst:.3e})"
            else:
                diff = [
                    (a, b) for a, b in zip(tail, dist) if a != b
                ][:3]
                out[name] = (
                    f"DIFF n_tail={len(tail)} n_dist={len(dist)} "
                    f"first={diff}"
                )
        except Exception as exc:  # pragma: no cover — report, don't die
            out[name] = f"ERROR {type(exc).__name__}: {exc}"
        print(f"# {name}: {out[name][:120]}", file=sys.stderr)
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": SF_DIR, "parity": out}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Graph analytics: PageRank power iteration (SURVEY.md §2.11 ⊕ — the
link-authority scorer a web-scale curation pipeline runs over its domain
graph; connected components live in functions/dedup.py).

PageRank here is the *standard* power iteration with uniform dangling-mass
redistribution (Page et al. 1999; the formulation GraphX's staticPageRank
normalizes to):

    r_{t+1}(v) = (1−d)/N + d·( Σ_{u→v} r_t(u)/outdeg(u) + dangling_t/N )

with a FIXED iteration count so the whole computation is a deterministic
dataflow — no convergence test, no driver-side loop condition on data
values, and an ANSI-SQL oracle can replicate it by unrolling the rounds.

Scale shape per round: edges ⋈ ranks on src (the big join — both sides
hash-partitioned on the same key every round, so AQE reuses the layout),
one groupBy(dst) partial-aggregated contribution sum, a 1-row dangling
aggregate broadcast back via crossJoin (never a driver collect), and a
left join onto the static node frame. Lineage is cut with a lazy
``localCheckpoint`` per round (the connected-components discipline —
dedup.py) so the final plan stays bounded at any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_data_pipeline_spark.sources.catalog import ensure_parallelism


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (duplicate
    edges should be deduped upstream if unweighted semantics are wanted).
    Returns (id, rank) for every node appearing as src or dst; ranks sum
    to 1 every round (dangling mass is redistributed, not dropped).

    ``broadcast_ranks=True`` broadcasts the per-round rank frame into the
    contribution join — the right shape whenever the NODE set fits in an
    executor (edges then never shuffle; the only exchange per round is
    the tiny partial-aggregated contribution sum). Checkpointed frames
    defeat AQE's size estimation, so this cannot be left to the
    optimizer. Default False: a billion-node graph must hash-join, and
    both sides then repartition on the same key every round."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # the edge frame is re-read EVERY round (contribution join) and per
    # round twice more via the dangling broadcast's lineage — cut its
    # upstream plan (which may itself be a multi-join graph build) once
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("__deg"))
    # static per-node frame: out-degree (null -> dangling)
    base = nodes.join(outdeg, nodes["id"] == outdeg["src"], "left").select(
        "id", F.col("__deg").alias("__deg")
    ).localCheckpoint(eager=False)
    n = nodes.agg(F.count("*").alias("__n"))

    ranks = base.crossJoin(F.broadcast(n)).select(
        "id", "__deg", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    d = float(damping)
    for _ in range(iterations):
        dangling = ranks.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        live = ranks.filter(F.col("__deg").isNotNull())
        if broadcast_ranks:
            live = F.broadcast(live)
        contribs = (
            e.join(live, e["src"] == F.col("id"))
            .select("dst", (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__sum"))
        )
        ranks = (
            base.crossJoin(F.broadcast(n))
            .crossJoin(F.broadcast(dangling))
            .join(contribs, base["id"] == contribs["dst"], "left")
            .select(
                "id", "__deg",
                (
                    (F.lit(1.0) - F.lit(d)) / F.col("__n")
                    + F.lit(d) * (
                        F.coalesce(F.col("__sum"), F.lit(0.0))
                        + F.col("__dm") / F.col("__n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", "rank")

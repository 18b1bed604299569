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
    personalization: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (duplicate
    edges should be deduped upstream if unweighted semantics are wanted).
    Returns (id, rank) for every node appearing as src or dst; ranks sum
    to 1 every round (dangling mass is redistributed, not dropped).

    ``personalization`` (a 1-column DataFrame of node ids) switches to
    PERSONALIZED PageRank / TrustRank (Gyöngyi, Garcia-Molina &
    Pedersen, VLDB 2004 — the seed-propagated authority score web-scale
    curation pipelines run against a hand-vetted trust set): the
    teleport distribution is uniform over the seed∩node set instead of
    all nodes, dangling mass is redistributed to the SEEDS, and ranks
    start at the teleport vector. Nodes unreachable from the seeds
    decay to 0 — exactly the spam-demotion semantics. The uniform path
    keeps its original arithmetic bit-for-bit (its SQL replicas unroll
    that exact expression).

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
    n = nodes.agg(F.count("*").alias("__n"))
    # static per-node frame: out-degree (null -> dangling) + the node
    # count folded in ONCE — keeping __n a 1-row frame instead costs a
    # fresh broadcast exchange per round (checkpoint boundaries defeat
    # ReusedExchange), 5 jobs that carry a single long
    base = nodes.join(outdeg, nodes["id"] == outdeg["src"], "left").select(
        "id", F.col("__deg").alias("__deg")
    )
    if personalization is not None:
        seed_col = personalization.columns[0]
        seeds = personalization.select(
            F.col(seed_col).alias("__sid")
        ).distinct()
        marked = base.join(
            F.broadcast(seeds), base["id"] == seeds["__sid"], "left"
        ).select(
            "id", "__deg", F.col("__sid").isNotNull().alias("__seed")
        )
        ns = marked.agg(
            F.sum(F.col("__seed").cast("long")).alias("__ns")
        )
        base = (
            marked.crossJoin(F.broadcast(ns))
            .select(
                "id", "__deg",
                # ns=0 (no seed intersects the graph) degrades to the
                # all-zero teleport instead of a divide-by-zero artifact
                F.when(
                    F.col("__seed") & (F.col("__ns") > 0),
                    F.lit(1.0) / F.col("__ns"),
                )
                .otherwise(F.lit(0.0)).alias("__p"),
            )
            .localCheckpoint(eager=False)
        )
        ranks = base.select("id", "__deg", "__p",
                            F.col("__p").alias("rank"))
    else:
        base = (
            base.crossJoin(F.broadcast(n))
            .select("id", "__deg", "__n")
            .localCheckpoint(eager=False)
        )
        ranks = base.select(
            "id", "__deg", "__n", (F.lit(1.0) / F.col("__n")).alias("rank")
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
        if broadcast_ranks:
            # node-scale by construction when the rank frame broadcasts —
            # hint it past AQE (post-broadcast-join stats are unknown, so
            # the rank-update join would otherwise shuffle both sides)
            contribs = F.broadcast(contribs)
        if personalization is not None:
            rank_col = (
                (F.lit(1.0) - F.lit(d)) * F.col("__p")
                + F.lit(d) * (
                    F.coalesce(F.col("__sum"), F.lit(0.0))
                    + F.col("__dm") * F.col("__p")
                )
            )
            keep = ["id", "__deg", "__p"]
        else:
            rank_col = (
                (F.lit(1.0) - F.lit(d)) / F.col("__n")
                + F.lit(d) * (
                    F.coalesce(F.col("__sum"), F.lit(0.0))
                    + F.col("__dm") / F.col("__n")
                )
            )
            keep = ["id", "__deg", "__n"]
        ranks = (
            base.crossJoin(F.broadcast(dangling))
            .join(contribs, base["id"] == contribs["dst"], "left")
            .select(*keep, rank_col.alias("rank"))
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", "rank")


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph (edges may
    arrive in either direction / duplicated; they are canonicalized
    first). Returns (id, triangles) for every node in >=1 triangle.

    Algorithm: degree-ordered edge orientation (Cohen 2009 / the
    GraphX-and-MapReduce standard) — orient every edge from the
    (degree, id)-smaller endpoint to the larger, generate wedges only
    from each node's ORIENTED out-neighbors, and close them against the
    oriented edge set. Orientation caps out-degree at O(√m) on any
    graph, so wedge volume is O(m^{3/2}) instead of Σ deg² — the skewed
    hub that makes naive wedge generation quadratic becomes a SINK with
    tiny out-degree. Triangle SET is orientation-invariant, so results
    match the textbook id-ordered 3-way self-join an oracle runs.

    Shape: degree agg (one shuffle), two equi-joins on node keys for the
    orientation, wedge self-join on the apex, closing equi-join on the
    (v, w) pair — every join a plain shuffle-hash/SMJ equi-join, no
    driver state."""
    und = (
        ensure_parallelism(edges)
        .select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("__deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.struct(
        F.col("__deg").alias("d"), F.col("a").alias("i")).alias("__ka"))
    db = deg.select(F.col("id").alias("b"), F.struct(
        F.col("__deg").alias("d"), F.col("b").alias("i")).alias("__kb"))
    oriented = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(F.col("__ka") < F.col("__kb"), F.col("a"))
            .otherwise(F.col("b")).alias("u"),
            F.when(F.col("__ka") < F.col("__kb"), F.col("b"))
            .otherwise(F.col("a")).alias("v"),
            F.greatest("__ka", "__kb").alias("__kv"),
        )
        .localCheckpoint(eager=False)
    )
    w1 = oriented.select("u", F.col("v").alias("x"), F.col("__kv").alias("__kx"))
    w2 = oriented.select("u", F.col("v").alias("y"), F.col("__kv").alias("__ky"))
    wedges = w1.join(w2, "u").filter(F.col("__kx") < F.col("__ky")).select(
        "u", "x", "y"
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"])
    return (
        tris.select(F.col("u").alias("id"))
        .union(tris.select(F.col("x").alias("id")))
        .union(tris.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("triangles"))
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    broadcast_labels: bool = False,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan et
    al. 2007, the formulation GraphX's LabelPropagation normalizes to)
    over an undirected graph given as a directed edge list (symmetrized
    internally; parallel edges deduped). Returns (id, community).

    Determinism (the fixed-dataflow discipline shared with ``pagerank``):
    labels start as the node's own id; each round EVERY node
    simultaneously adopts the most frequent label among its neighbors
    plus itself (the self-vote is the standard damping that prevents
    2-cycles of bipartite label swap), ties broken by the SMALLEST
    label. A fixed iteration count and total tie order make the whole
    computation a deterministic dataflow an ANSI-SQL oracle replicates
    by unrolling rounds — no convergence test, no RNG vertex ordering.

    Scale shape per round: one edges ⋈ labels equi-join on src (both
    sides re-partition on the same key every round, so AQE reuses the
    exchange), a (dst, label) partial-aggregated count — map-side
    combine bounds the shuffle at Σ_v distinct-neighbor-labels(v) ≤ |E|
    rows — then a per-node argmax via min(struct(-count, label)), an
    ordinary aggregate rather than a window, so no single partition
    ever holds the full node set. ``broadcast_labels=True`` broadcasts
    the per-round label frame into the join (right shape when the NODE
    set fits in an executor: edges then never shuffle); checkpointed
    frames defeat AQE size estimation, so this cannot be left to the
    optimizer. Lineage is cut per round with lazy ``localCheckpoint``
    (the connected-components discipline)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    # ONE checkpointed frame serves both the vote edges and the node
    # set: symmetrize + dedupe WITHOUT dropping self-loops, so its src
    # side covers every node — including self-loop-only nodes, which
    # must appear as singleton communities (ADVICE r6). The vote join
    # filters src≠dst per round (a predicate over the cached scan — a
    # node must not double-vote its own label on top of the standard
    # self-vote). Deriving nodes from a second scan of the raw lineage
    # cost +28% (VERDICT r7 #7); checkpointing the raw edge list AND
    # sym doubled cache pressure and OOMed the 100× rehearsal.
    sym0 = (
        e.union(e.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = sym0.filter(F.col("src") != F.col("dst"))
    nodes = (
        sym0.select(F.col("src").alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # self-vote edge (id, id) unioned per round below via the node frame
    labels = nodes.select("id", F.col("id").alias("lab"))
    for _ in range(iterations):
        lab_in = F.broadcast(labels) if broadcast_labels else labels
        votes = (
            sym.join(lab_in, sym["src"] == lab_in["id"])
            .select("dst", "lab")
            .union(labels.select(F.col("id").alias("dst"), "lab"))
        )
        labels = (
            votes.groupBy("dst", "lab")
            .agg(F.count("*").alias("__c"))
            .groupBy("dst")
            .agg(
                F.min(
                    F.struct((-F.col("__c")).alias("nc"),
                             F.col("lab").alias("lab"))
                ).alias("__best")
            )
            .select(F.col("dst").alias("id"), F.col("__best.lab").alias("lab"))
            .localCheckpoint(eager=False)
        )
    return labels.select("id", F.col("lab").alias("community"))


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Hop distance from a SEED SET over a directed edge list: returns
    (id, dist) for every node reachable within ``max_hops``, dist = the
    minimum number of edges from any seed (seeds themselves at 0).
    The k-hop feature extractor of fraud/linkage pipelines ("how far is
    this account from a known-bad set").

    Implementation is FRONTIER BFS, not full relaxation: each round
    joins the edge list with only the nodes discovered last round,
    anti-joins the visited set, and appends the new nodes at dist t+1.
    With unit weights the first discovery is the minimum distance, so
    the output is identical to ``max_hops`` rounds of Bellman-Ford
    relaxation — which is what the ANSI-SQL oracle runs (a per-round
    UNION ALL + group-min is far simpler in SQL, and the equivalence is
    exactly the property worth pinning). Work per round is
    O(edges-out-of-frontier), not O(|E|): the frontier join probes the
    edge table (broadcast when ``broadcast_frontier``, the right hint
    while the frontier is executor-sized; hash-join otherwise), and the
    visited set only ever grows by newly reached nodes. Lineage cut per
    round with lazy localCheckpoint (the pagerank discipline)."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    visited = seeds.select(F.col(seeds.columns[0]).alias("id")).distinct() \
        .select("id", F.lit(0).alias("dist")).localCheckpoint(eager=False)
    frontier = visited
    for hop in range(1, max_hops + 1):
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        reached = (
            e.join(f, e["src"] == f["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new = reached.join(visited, "id", "left_anti").select(
            "id", F.lit(hop).alias("dist")
        ).localCheckpoint(eager=False)
        visited = visited.unionByName(new).localCheckpoint(eager=False)
        frontier = new
    return visited


def kcore_nodes(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition for a GIVEN k by synchronous iterative
    peeling (Matula & Beck 1983's algorithm in its distributed
    fixed-round form): the k-core is the maximal subgraph where every
    node keeps degree ≥ k, computed by repeatedly deleting nodes whose
    CURRENT degree is < k. The graph is symmetrized and deduped
    (self-loops dropped — they never contribute to coreness).

    Determinism (the pagerank/LPA fixed-dataflow discipline): exactly
    ``rounds`` peel rounds — each round recomputes degrees over the
    surviving edge set and keeps both-endpoint-surviving edges. Peeling
    is monotone, so once the set stabilizes further rounds are no-ops;
    if ``rounds`` is smaller than the peel depth the result is the
    deterministic partial peel (both engines agree — the oracle unrolls
    the same rounds). Returns (id, degree) for nodes surviving all
    rounds, with their degree inside the surviving subgraph.

    Scale shape per round: one partial-aggregated degree count over the
    surviving edges (shuffle ≤ |V| rows), then two equi-joins of the
    edge set against the ≥k survivor frame (shuffle ≤ |E| rows) —
    bounded by the LPA round cost; lineage cut per round with lazy
    localCheckpoint. Cite: reference has no graph tier; this extends
    SURVEY §2.11 alongside pagerank/triangles/LPA/BFS."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    cur = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # early-exit when a round peels nothing: further rounds are exact
    # no-ops (peeling is monotone), so the output is IDENTICAL to
    # running all ``rounds`` — and the oracle's unrolled no-op rounds
    # reproduce the same frame. The driver-side state per round is ONE
    # node count (the bounded-small-actions discipline of the CC loop);
    # without it, 8 rounds of 59M-row checkpointed edge frames thrash a
    # single JVM while rounds 3+ change nothing.
    prev_nodes = None
    for _ in range(rounds):
        keep = (
            cur.groupBy("src")
            .agg(F.count("*").alias("__deg"))
            .filter(F.col("__deg") >= k)
            .select("src")
            .localCheckpoint(eager=False)
        )
        n_keep = keep.count()
        if prev_nodes is not None and n_keep == prev_nodes:
            break
        prev_nodes = n_keep
        cur = (
            cur.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        if n_keep == 0:
            break
    return (
        cur.groupBy("src")
        .agg(F.count("*").cast("long").alias("degree"))
        .select(F.col("src").alias("id"), "degree")
    )


def kcore_oracle_sql(
    edges_sql: str,
    k: int,
    rounds: int = 8,
) -> str:
    """DuckDB replica of ``kcore_nodes`` — the symmetrized deduped edge
    set, then each peel round unrolled as (degree, survivor, edge) CTEs.
    ``edges_sql`` must select columns (src, dst)."""
    ctes = [
        f"""e0 AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM ({edges_sql}) r0
        UNION ALL
        SELECT dst, src FROM ({edges_sql}) r1) u
      WHERE src <> dst)"""
    ]
    for r in range(rounds):
        ctes.append(
            f"""k{r} AS MATERIALIZED (
      SELECT src FROM (SELECT src, count(*) AS deg FROM e{r}
                       GROUP BY src) d WHERE deg >= {k})"""
        )
        ctes.append(
            f"""e{r + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{r} e
      JOIN k{r} a ON e.src = a.src
      JOIN k{r} b ON e.dst = b.src)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY src"""
    )

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

from census_data_pipeline_spark.sources.catalog import (
    ensure_parallelism,
    round_materialize as _round_materialize,
    round_persist as _round_persist,
)


def _local_codes_ok(*series) -> bool:
    """Gate for the bounded numpy fast paths (ADVICE r12): they code
    values via np.unique/np.searchsorted, which raise TypeError when a
    None/NaN is mixed into an object array, while the distributed
    equi-joins simply never match the null rows. Any null in a coded
    column ⇒ the local path bails (returns None at its call site) and
    the caller falls through to the distributed dataflow — identical
    semantics by construction, no per-path null policy to keep in
    sync."""
    import pandas as pd

    return not any(bool(pd.isna(s).any()) for s in series)


def _sorted_codes(*arrays):
    """``universe = np.unique(concatenate(arrays))`` plus each array's
    ``np.searchsorted(universe, a)`` codes — computed via one
    ``pd.factorize`` hash pass over the data and ONE comparison sort
    over the (much smaller) unique set, then a rank remap. Outputs are
    IDENTICAL to the unique/searchsorted pair (same sorted universe,
    same int64 codes — both are lexicographic Python-str comparisons),
    but ~8× faster at edge scale (measured 1.56 s → 0.18 s on 587k
    string edges): np.unique/searchsorted over millions of Python
    string objects pay a per-comparison interpreter cost the hash pass
    avoids. Inputs must be null-free (callers gate via
    ``_local_codes_ok``). Returns (universe, [codes per array])."""
    import numpy as np
    import pandas as pd

    cat = np.concatenate(arrays) if len(arrays) > 1 else arrays[0]
    codes, uniq = pd.factorize(cat)
    uniq = np.asarray(uniq)
    order = np.argsort(uniq, kind="stable")
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    sc = rank[codes]
    universe = uniq[order]
    outs = []
    off = 0
    for a in arrays:
        outs.append(sc[off:off + len(a)])
        off += len(a)
    return universe, outs


def _pagerank_full_local(
    eprep: DataFrame,
    iterations: int,
    d: float,
    personalization: DataFrame | None = None,
) -> DataFrame | None:
    """The whole power iteration in ONE bounded driver pass (r13, the
    ``_lpa_full_local`` discipline): collect the projected edge list
    (parallel edges KEPT — they split rank per edge row, exactly as the
    distributed contribution join fans out), replay the identical
    per-round arithmetic in numpy — same expression order, dangling
    mass and teleport formulas — and hand back (id, rank). Per-dst
    float sums accumulate in a different order than Spark's partial
    aggregation, which differs by last-ulp amounts absorbed by the
    query-level 6-dp rounding (the hits_scores tolerance argument; the
    green driver rows pin it). Callers gate on the edge count before
    entering; returns None on a null src/dst or null seed (the caller
    falls back to the distributed rounds)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    pdf = eprep.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf["src"], pdf["dst"]):
        return None
    seeds_vals = None
    if personalization is not None:
        sc0 = personalization.columns[0]
        spdf = (
            personalization.select(F.col(sc0).alias("__sid"))
            .distinct()
            .toPandas()
        )
        if bool(pd.isna(spdf["__sid"]).any()):
            return None
        seeds_vals = spdf["__sid"].to_numpy()
    f = eprep.schema["src"]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("rank", DoubleType(), True),
    ])
    svals = pdf["src"].to_numpy()
    dvals = pdf["dst"].to_numpy()
    if len(svals) == 0:
        return eprep.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "rank": []}), schema)
    # hash-coded, not sort-coded (pd.factorize, first-seen order): rank
    # semantics never depend on code ORDER, and np.unique/searchsorted
    # over millions of Python string objects costs seconds
    codes, ids = pd.factorize(np.concatenate([svals, dvals]))
    ids = np.asarray(ids)
    n = len(ids)
    scode = codes[: len(svals)].astype(np.int64)
    dcode = codes[len(svals):].astype(np.int64)
    outdeg = np.zeros(n, dtype=np.int64)
    np.add.at(outdeg, scode, 1)
    dang = outdeg == 0
    nd = float(n)
    if seeds_vals is not None:
        sm = np.zeros(n, dtype=bool)
        pos = pd.Index(ids).get_indexer(seeds_vals)
        sm[pos[pos >= 0]] = True
        ns = int(sm.sum())
        # ns = 0 degrades to the all-zero teleport (the distributed
        # branch's divide-by-zero guard)
        p = np.where(sm, 1.0 / ns, 0.0) if ns > 0 else np.zeros(n)
        rank = p.copy()
    else:
        p = None
        rank = np.full(n, 1.0 / nd)
    for _ in range(iterations):
        dm = float(rank[dang].sum())
        contrib = np.zeros(n)
        np.add.at(contrib, dcode, rank[scode] / outdeg[scode])
        if p is not None:
            rank = (1.0 - d) * p + d * (contrib + dm * p)
        else:
            rank = (1.0 - d) / nd + d * (contrib + dm / nd)
    out = pd.DataFrame({"id": ids, "rank": rank})
    return eprep.sparkSession.createDataFrame(out, schema)


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = False,
    personalization: DataFrame | None = None,
    local_tail_max: int = 2_000_000,
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
    # persist the projected edge list ONCE, lazily (r14 — a bare lazy
    # localCheckpoint's consumers recompute its lineage): the GATE
    # count right below is the first action and materializes the
    # blocks, so the local tail's collect and the distributed rounds
    # read them instead of re-running the upstream graph build; the
    # r13 eager count inside round_materialize was a duplicate of the
    # gate count
    e = _round_persist(ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ))
    # Bounded local tail (r13, the label_propagation discipline): the
    # power iteration's wall-clock under ~1M edges is pure per-round
    # scheduling/planning floor, so below the hard gate the whole loop
    # replays off one Arrow collect (6-dp-identical; unit-pinned).
    # 100 TB graphs never enter the gate and stay fully distributed.
    if local_tail_max > 0 and e.count() <= local_tail_max:
        tail = _pagerank_full_local(
            e, iterations, float(damping), personalization
        )
        if tail is not None:  # None ⇒ nulls present, stay distributed
            e.unpersist()
            return tail
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
        base = _round_materialize(
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
        )
        ranks = base.select("id", "__deg", "__p",
                            F.col("__p").alias("rank"))
    else:
        base = _round_materialize(
            base.crossJoin(F.broadcast(n)).select("id", "__deg", "__n")
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
    # bare lazy checkpoints here (r14: the round_persist variant was
    # probed paired and REGRESSED graph_triangles 3.3→4.4 s — the
    # checkpoint conversion already executes these frames under AQE,
    # and the extra InMemoryRelation write cost more than it saved)
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


def _lpa_local_tail(sym0: DataFrame, iterations: int,
                    weighted: bool = False) -> DataFrame:
    """Run the WHOLE label-propagation loop in one bounded driver pass
    (the ``_coreness_local_tail`` discipline, r12): collect the ≤-cap
    symmetric deduped frame (self-loops included — they define the
    node set), replay the identical per-round dataflow locally (vote
    counts are exact integers; the (−count, label) tuple order is the
    struct-min order), and hand back (id, lab). Callers gate on
    2·|sym0| before entering (nodes ⊆ sym0 src values, so the collect
    is bounded). Bit-identical to the distributed rounds
    (unit-pinned: tests/test_round12_ops.py). Returns None when a
    null src/dst is present (ADVICE r12) — caller falls back to the
    distributed rounds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    pdf = sym0.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf["src"], pdf["dst"]):
        return None
    # sorted codes (code order = value order); the symmetric frame
    # guarantees src covers every node, so the src∪dst universe equals
    # np.unique(src) and the codes match the searchsorted originals
    ids, (scode, dcode) = _sorted_codes(
        pdf["src"].to_numpy(), pdf["dst"].to_numpy()
    )
    n = len(ids)
    f = sym0.schema["src"]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("lab", f.dataType, f.nullable),
    ])
    if n == 0:
        return sym0.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "lab": []}), schema)
    wv = (pdf["__w"].to_numpy(dtype=np.float64) if weighted else None)
    lab = _lpa_replay(scode, dcode, n, iterations, w=wv)
    out = pd.DataFrame({"id": ids, "lab": ids[lab]})
    return sym0.sparkSession.createDataFrame(out, schema)


def _lpa_replay(scode, dcode, n, iterations, w=None):
    """The numpy LPA vote core — identical round-for-round to the
    distributed dataflow (integer vote counts — or weight sums with
    the 6-dp floor-half-up score, r13 — and the (−score, label)
    struct-min tie order as a lexsort over sorted value codes).
    ``scode/dcode`` form the deduped symmetric frame WITH self-loops
    (they define the node set; votes exclude them, the self-vote —
    weight 1.0 — is added explicitly). Returns the final label-code
    array."""
    import numpy as np

    mask = scode != dcode  # vote edges exclude self-loops
    vdst = dcode[mask]
    vsrc = scode[mask]
    vw = w[mask] if w is not None else None
    lab = np.arange(n, dtype=np.int64)  # own-id start, codes = sorted ids
    selfk = np.arange(n, dtype=np.int64) * n
    for _ in range(iterations):
        # vote keys (dst, label-of-src) + the standard self-vote; counts
        # are exact integers (weighted: integer-valued-double sums, the
        # community-tier parity argument), so engine order cannot matter
        keys = np.concatenate([vdst * n + lab[vsrc], selfk + lab])
        if w is None:
            uk, score = np.unique(keys, return_counts=True)
        else:
            vals = np.concatenate([vw, np.ones(n, dtype=np.float64)])
            uk, inv = np.unique(keys, return_inverse=True)
            sums = np.zeros(len(uk), dtype=np.float64)
            np.add.at(sums, inv, vals)
            # the louvain ΔQ 6-dp floor-half-up — engine-portable order
            score = np.floor(sums * 1_000_000.0 + 0.5) / 1_000_000.0
        kd = uk // n
        kl = uk % n
        # per dst: min(−score, label) ≡ the distributed struct-min
        order = np.lexsort((kl, -score, kd))
        firsts = np.unique(kd[order], return_index=True)[1]
        lab = kl[order][firsts]  # every node has ≥ the self vote
    return lab


def _lpa_full_local(eprep: DataFrame, iterations: int,
                    weighted: bool = False) -> DataFrame:
    """The whole LPA run in ONE bounded driver pass off the RAW edge
    frame (r12): collect, symmetrize+dedupe in numpy (self-loops kept
    — they define the node set, the ADVICE r6 contract), replay the
    vote rounds. Skips the distributed union+distinct shuffle the
    sym0-based tail still paid; output identical (unit-pinned).
    Returns None when a null src/dst is present (ADVICE r12) — caller
    falls back to the distributed rounds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    pdf = eprep.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf["src"], pdf["dst"]):
        return None
    f = eprep.schema["src"]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("community", f.dataType, f.nullable),
    ])
    svals = pdf["src"].to_numpy()
    dvals = pdf["dst"].to_numpy()
    wvals = pdf["__w"].to_numpy(dtype=np.float64) if weighted else None
    if weighted:
        # the weight dialect drops NULL/non-positive rows BEFORE the
        # node set forms — ids must come from surviving edges only
        keep = wvals > 0  # NaN compares False, the distributed filter
        svals, dvals, wvals = svals[keep], dvals[keep], wvals[keep]
    if len(svals) == 0:
        return eprep.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "community": []}), schema)
    ids, (sc0, dc0) = _sorted_codes(svals, dvals)
    scode, dcode, wsym = _np_symmetrize(svals, dvals, wvals, ids,
                                        keep_self=True, codes=(sc0, dc0))
    lab = _lpa_replay(scode, dcode, len(ids), iterations,
                      w=wsym if weighted else None)
    out = pd.DataFrame({"id": ids, "community": ids[lab]})
    return eprep.sparkSession.createDataFrame(out, schema)


def label_propagation(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    broadcast_labels: bool = False,
    local_tail_max: int = 2_000_000,
    weight_col: str | None = None,
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

    ``weight_col`` (r13 — VERDICT r12 #4, completing the community
    tier's weight parity): votes become WEIGHT SUMS under the single
    ``_symmetrize_simple`` dialect (NULL/non-positive rows dropped —
    before the node set forms — parallel edges weight-summed per
    symmetric direction), the self-vote keeps weight 1.0 (the same
    fixed damping), and each round's per-label score is 6-dp
    floor-half-up rounded (the louvain ΔQ discipline) before the
    (−score, label) struct-min so the adoption trajectory is
    engine-portable; integer-valued weights keep every sum an exact
    double. A 40-purchase relationship then pulls 40× harder than a
    one-off, matching weighted modularity/Louvain's reading of the
    same graph.

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
    (the connected-components discipline).

    **Bounded local tail** (r12, the ``_coreness_local_tail``
    discipline): the synchronous rounds' wall-clock is a fixed
    per-round scheduling floor, so once 2·|sym| ≤ ``local_tail_max``
    (hard gate, default 2M, 0 disables — nodes ⊆ sym src values bounds
    the collect) the whole loop runs locally off one Arrow collect,
    bit-identical output (integer vote counts, identical tie order;
    unit-pinned). 100 TB graphs never enter the gate and stay fully
    distributed."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    weighted = weight_col is not None
    # lazily persisted (r14): the GATE count right below is the first
    # action and materializes the blocks; the full-local Arrow collect
    # and the distributed symmetrize then read them instead of
    # re-running the upstream graph build (the round_materialize
    # finding, minus r13's duplicate eager count)
    if weighted:
        e = _round_persist(ensure_parallelism(edges).select(
            F.col(src).alias("src"), F.col(dst).alias("dst"),
            F.col(weight_col).cast("double").alias("__w"),
        ))
    else:
        e = _round_persist(ensure_parallelism(edges).select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        ))
    if local_tail_max > 0 and 2 * e.count() <= local_tail_max:
        full = _lpa_full_local(e, iterations, weighted=weighted)
        if full is not None:  # None ⇒ null src/dst, stay distributed
            return full
    # ONE checkpointed frame serves both the vote edges and the node
    # set: symmetrize + dedupe WITHOUT dropping self-loops, so its src
    # side covers every node — including self-loop-only nodes, which
    # must appear as singleton communities (ADVICE r6). The vote join
    # filters src≠dst per round (a predicate over the cached scan — a
    # node must not double-vote its own label on top of the standard
    # self-vote). Deriving nodes from a second scan of the raw lineage
    # cost +28% (VERDICT r7 #7); checkpointing the raw edge list AND
    # sym doubled cache pressure and OOMed the 100× rehearsal.
    if weighted:
        ef = e.filter(F.col("__w").isNotNull() & (F.col("__w") > 0))
        sym0 = (
            ef.union(ef.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"), "__w"))
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
            .localCheckpoint(eager=False)
        )
    else:
        sym0 = (
            e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
            .distinct()
            .localCheckpoint(eager=False)
        )
    if local_tail_max > 0 and 2 * sym0.count() <= local_tail_max:
        tail = _lpa_local_tail(sym0, iterations, weighted=weighted)
        if tail is not None:  # None ⇒ null src/dst, stay distributed
            return tail.select("id", F.col("lab").alias("community"))
    sym = sym0.filter(F.col("src") != F.col("dst"))
    nodes = (
        sym0.select(F.col("src").alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # self-vote edge (id, id) unioned per round below via the node frame
    labels = nodes.select("id", F.col("id").alias("lab"))
    vote_w = (F.col("__w") if weighted else F.lit(1)).alias("__vw")
    self_w = (F.lit(1.0) if weighted else F.lit(1)).alias("__vw")
    for _ in range(iterations):
        lab_in = F.broadcast(labels) if broadcast_labels else labels
        votes = (
            sym.join(lab_in, sym["src"] == lab_in["id"])
            .select("dst", "lab", vote_w)
            .union(labels.select(F.col("id").alias("dst"), "lab", self_w))
        )
        if weighted:
            # 6-dp floor-half-up score (the louvain ΔQ discipline)
            score = (F.floor(F.sum("__vw") * 1_000_000.0 + F.lit(0.5))
                     / F.lit(1_000_000.0)).alias("__c")
        else:
            score = F.count("*").alias("__c")
        labels = (
            votes.groupBy("dst", "lab")
            .agg(score)
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


def lpa_labels_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    weighted: bool = False,
) -> str:
    """DuckDB replica of ``label_propagation`` as UNROLLED round CTEs
    (the _pagerank_oracle discipline) returning a parenthesized
    subquery selecting (id, community). Unweighted: integer vote
    counts; ``weighted`` mirrors ``weight_col`` (``edges_sql`` then
    selects (src, dst, w)) — NULL/non-positive rows dropped BEFORE the
    node set forms, per-direction weight sums, self-vote weight 1.0,
    the 6-dp floor-half-up score before the (score desc, label asc)
    pick, exactly the engine's round dataflow."""
    if weighted:
        head = f"""pe0 AS MATERIALIZED (
      SELECT src, dst, w FROM ({edges_sql}) pe
      WHERE w IS NOT NULL AND w > 0),
    psym0 AS MATERIALIZED (
      SELECT src, dst, SUM(w) AS w FROM (
        SELECT src, dst, w FROM pe0
        UNION ALL SELECT dst, src, w FROM pe0) u
      GROUP BY src, dst),
    psym AS (SELECT src, dst, w FROM psym0 WHERE src <> dst)"""
        vote = """SELECT s.dst, l.lab, s.w
                FROM psym s JOIN {prev} l ON s.src = l.id
                UNION ALL SELECT id AS dst, lab, 1.0 AS w FROM {prev}"""
        score = "FLOOR(SUM(v.w) * 1000000.0 + 0.5) / 1000000.0"
    else:
        head = f"""pe0 AS MATERIALIZED (
      SELECT src, dst FROM ({edges_sql}) pe),
    psym0 AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM pe0
        UNION ALL SELECT dst, src FROM pe0) u),
    psym AS (SELECT src, dst FROM psym0 WHERE src <> dst)"""
        vote = """SELECT s.dst, l.lab
                FROM psym s JOIN {prev} l ON s.src = l.id
                UNION ALL SELECT id AS dst, lab FROM {prev}"""
        score = "count(*)"
    rounds = []
    prev = "pl0"
    for t in range(1, iterations + 1):
        cur = f"pl{t}"
        rounds.append(f"""
    {cur} AS MATERIALIZED (
      SELECT dst AS id, lab FROM (
        SELECT dst, lab, row_number() OVER (
                 PARTITION BY dst ORDER BY c DESC, lab ASC) AS rn
        FROM (SELECT v.dst, v.lab, {score} AS c
              FROM ({vote.format(prev=prev)}) v
              GROUP BY v.dst, v.lab) cnt) rk
      WHERE rn = 1)""")
        prev = cur
    return f"""(WITH {head},
    pnodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM psym0),
    pl0 AS MATERIALIZED (SELECT id, id AS lab FROM pnodes),{",".join(rounds)}
    SELECT id, lab AS community FROM {prev})"""


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
    broadcast_max_drop: int = 2_000_000,
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

    Scale shape (r10 frontier-delta rework, VERDICT r9 #1): degrees are
    counted over the full edge set ONCE, then MAINTAINED, and the edge
    frame is STATIC — never pruned, never re-checkpointed. Per round:
    (1) the dropped-node set D = {deg < k} (node-scale, usually tiny
    after round 1); (2) the degree delta, a broadcast-hash probe of
    the static edge frame against D on dst followed by a
    partial-aggregated count — only edges INTO DROPPED NODES reach the
    shuffle, the frontier discipline of ``bfs_distances``; (3) the
    degree frame update, two node-scale joins. Drop sets are DISJOINT
    across rounds, so probing the static frame debits each edge
    exactly once over the whole peel — pruning would change nothing
    but costs: r9's shape shuffled |E| rows twice per round (survivor
    equi-joins) plus a full degree recount (133 s / last-decade α
    0.949 at 100×, the costliest rehearsed family), and an
    intermediate r10 variant that re-checkpointed a pruned edge frame
    per round OOMed the 24 g rehearsal JVM at 100× (eight 59M-edge
    cached copies). Maintained degrees are exact: the symmetrized
    simple graph has one row (v,u) per neighbor u, so for a survivor
    v, new_deg(v) = deg(v) − |{(v,u): u ∈ ∪D}| — exactly the recount
    over the surviving edges, which is what the unrolled SQL oracle
    computes; a survivor whose degree hits 0 is excluded from the
    output (the oracle derives output from surviving EDGES). Above
    ``broadcast_max_drop`` dropped nodes the probe falls back to a
    shuffle join (same semantics — only round 1 of a low-k peel ever
    gets near that). Early-exit when a round drops nothing: peeling
    is monotone, further rounds are exact no-ops, so the output is
    IDENTICAL to running all ``rounds`` (one driver-side count per
    round — the bounded-small-actions discipline). Cite: reference has
    no graph tier; this extends SURVEY §2.11 alongside
    pagerank/triangles/LPA/BFS."""
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
    deg = (
        cur.groupBy("src")
        .agg(F.count("*").alias("__deg"))
        .select(F.col("src").alias("id"), "__deg")
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        drop = (
            deg.filter(F.col("__deg") < k)
            .select("id")
            .localCheckpoint(eager=False)
        )
        n_drop = drop.count()
        if n_drop == 0:
            break
        d = F.broadcast(drop) if n_drop <= broadcast_max_drop else drop
        lost = (
            cur.join(d, cur["dst"] == d["id"])
            .groupBy("src")
            .agg(F.count("*").alias("__lost"))
        )
        deg = (
            deg.join(d, "id", "left_anti")
            .join(lost, F.col("id") == lost["src"], "left")
            .select(
                "id",
                (F.col("__deg")
                 - F.coalesce(F.col("__lost"), F.lit(0))).alias("__deg"),
            )
            .localCheckpoint(eager=False)
        )
    # the oracle derives its output from the surviving EDGE frame
    # (GROUP BY src over e{rounds}), so a survivor whose last neighbor
    # was peeled in the final executed round — maintained degree 0,
    # no surviving edges — must not appear; with early-exit this only
    # matters when ``rounds`` is exhausted mid-peel.
    return (
        deg.filter(F.col("__deg") > 0)
        .select("id", F.col("__deg").cast("long").alias("degree"))
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


def _coreness_local_tail(cur: DataFrame, deg: DataFrame, k: int) -> DataFrame:
    """Finish ``coreness``'s ascending-k peel on the ≤-cap alive
    residue in ONE bounded driver pass: collect the maintained
    (id, degree) frame plus the both-endpoints-alive probe of the
    static symmetric edge frame (the same broadcast join a normal
    round performs), run the identical min-degree bucket peel locally
    (Batagelj & Zaveršnik 2003 ordering with the level floor k−1 the
    distributed rounds established), and return the (id, coreness)
    frame. The collect is bounded by ``local_tail_max`` — callers gate
    on alive n + Σdeg before entering."""
    alive = {r["id"]: int(r["__deg"]) for r in deg.collect()}
    a1 = deg.select(F.col("id").alias("__a1"))
    a2 = deg.select(F.col("id").alias("__a2"))
    pdf = (
        cur.join(F.broadcast(a1), cur["src"] == F.col("__a1"))
        .join(F.broadcast(a2), cur["dst"] == F.col("__a2"))
        .select("src", "dst")
        .toPandas()  # Arrow batch transfer — the collect stays bounded
    )
    adj: dict = {}
    for s_, d_ in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        adj.setdefault(s_, []).append(d_)
    maxd = max(alive.values(), default=0)
    buckets: list[set] = [set() for _ in range(maxd + 1)]
    for v, dv in alive.items():
        buckets[dv].add(v)
    # Min-degree serial processing ≡ the distributed batch rounds:
    # within a drop batch every node's degree-at-processing is < the
    # batch level, so max(kcur, d) reproduces the batch's k−1; the
    # popped-degree sequence is non-decreasing (neighbors never move
    # below the current level), so kcur is the running peel level.
    kcur = k - 1
    res = []
    d = 0
    remaining = len(alive)
    while remaining:
        while not buckets[d]:
            d += 1
        v = buckets[d].pop()
        kcur = max(kcur, d)
        res.append((v, kcur))
        del alive[v]
        remaining -= 1
        for u in adj.get(v, ()):
            du = alive.get(u)
            if du is not None and du > d:
                buckets[du].discard(u)
                buckets[du - 1].add(u)
                alive[u] = du - 1
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([
        deg.schema["id"],
        StructField("coreness", LongType(), False),
    ])
    out = pd.DataFrame(res, columns=["id", "coreness"])
    # Arrow batch transfer back out, mirroring the toPandas on the way
    # in — a list-of-tuples createDataFrame at the cap is py4j-heavy
    return deg.sparkSession.createDataFrame(out, schema)


def coreness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20_000,
    broadcast_max_drop: int = 2_000_000,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """FULL coreness decomposition (Matula & Beck 1983): every
    non-isolated node's core number — the largest k such that the node
    belongs to the k-core — by ascending-k peeling that REUSES the
    maintained state across k instead of restarting per k (VERDICT r9
    #1). Returns (id, coreness); the graph is symmetrized, deduped,
    self-loops dropped (they never contribute to coreness). This is the
    standard graph-curation density signal: coreness ≥ k is exactly
    ``kcore_nodes(k)`` membership, for every k at once.

    Scale shape — three disciplines compose:

    * **Min-degree level jumps.** When no alive node has degree < k the
      peel level jumps straight to min(alive degree) + 1 (the next level
      at which anything peels), so EVERY round drops ≥ 1 node and the
      round count is bounded by the number of distinct drop events
      (68 at sf0.1), not by the degeneracy × inner-depth product.
      Dropped nodes get coreness k−1 — identical to stepping k by 1
      through the intervening exact-no-op levels.
    * **Frontier-delta degrees, never a recount.** Degrees are counted
      ONCE over the symmetrized edge set, then maintained: per round the
      drop set D = {deg < k} is broadcast against the STATIC edge frame
      to count each survivor's edges into D (drop sets are disjoint, so
      every edge is debited exactly once across the whole peel and the
      edge frame never needs pruning or rewriting — no per-round |E|-row
      shuffle OR checkpoint; the only |E|-scale work is one broadcast-
      hash probe scan per round). Maintained degree is exact: for alive
      v, deg(v) − |{(v,u): u ∈ ∪D}| is the recount over surviving edges.
    * **One bounded driver action per round** (the CC/BFS discipline): a
      single (min, count) scalar aggregate over the node-scale degree
      frame decides the jump and the broadcast; node-scale frames are
      lineage-cut with lazy localCheckpoint.

    * **Bounded local tail** (the BLAS-path discipline: a hybrid with a
      HARD documented cap, r11). The peel's round count is dominated by
      the long high-k tail, where the alive graph has shrunk to a sliver
      of the input; once the per-round scalar shows alive n + Σdeg ≤
      ``local_tail_max`` the remaining peel runs in one pass — collect
      the ≤-cap alive subgraph (both-endpoints-alive probe of the static
      frame, the SAME broadcast join a normal round does), finish the
      identical ascending-k bucket peel locally, and union the result
      back. Coreness is a unique fixpoint, so the split point cannot
      change any value — unit-pinned against the all-distributed path.
      At 100 TB the early data-scale rounds stay fully distributed; the
      cap only ever admits a bounded residue (set 0 to disable).

    Above ``broadcast_max_drop`` ALIVE nodes the per-round joins fall
    back to shuffles (same semantics; only the first rounds of a
    billion-node graph get there, and the frames are node-scale).
    ``max_rounds`` is a safety cap — every round drops ≥ 1 node so the
    peel terminates in ≤ |V| rounds; exceeding the cap raises rather
    than returning a silent partial decomposition. Oracle:
    ``coreness_oracle_sql`` replicates the peel as ONE recursive CTE
    (window-function degree recount per iteration, level increments as
    exact-no-op iterations) — run-to-completion, so both engines compute
    the unique peel fixpoint. Cite: reference has no graph tier; this
    extends SURVEY §2.11 alongside kcore_nodes/pagerank/LPA/BFS."""
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    # lazily persisted (r14): the first degree-probe aggregate below
    # materializes the blocks; the k-probe aggregates, the local
    # tail's two collects and every distributed round then read cur
    # instead of re-running the symmetrize+distinct (r13's eager count
    # duplicated that first probe)
    cur = _round_persist(
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = (
        cur.groupBy("src")
        .agg(F.count("*").alias("__deg"))
        .select(F.col("src").alias("id"), "__deg")
        .localCheckpoint(eager=False)
    )
    out: list[DataFrame] = []
    k = 1
    frame_rows: int | None = None  # |cur| = Σdeg at the last (re)build
    for _ in range(max_rounds):
        row = deg.agg(
            F.min("__deg").alias("mn"), F.count("*").alias("n"),
            F.sum("__deg").alias("sd"),
        ).first()
        if row["n"] == 0:
            break
        if frame_rows is None:
            frame_rows = int(row["sd"])
        if (
            local_tail_max > 0
            and int(row["n"]) + int(row["sd"]) <= local_tail_max
        ):
            tail = _coreness_local_tail(cur, deg, k)
            out.append(tail)
            break
        if int(row["sd"]) * 2 <= frame_rows:
            # Amortized frame prune (r11): the static-frame discipline
            # avoids per-round |E| rewrites, but once HALF the frame is
            # dead every probe scans 2× the live edges — one alive⨝alive
            # rebuild here costs a single probe's work and halves every
            # later round, so total probe work tracks Σ alive sizes
            # (geometric) instead of rounds × |E|. Dead rows never match
            # a drop set (drops are alive-only), so pruning is
            # semantics-free — unit-pinned against the unpruned path.
            alive1 = deg.select(F.col("id").alias("__al1"))
            alive2 = deg.select(F.col("id").alias("__al2"))
            if int(row["n"]) <= broadcast_max_drop:
                alive1, alive2 = F.broadcast(alive1), F.broadcast(alive2)
            cur = (
                cur.join(alive1, cur["src"] == F.col("__al1"))
                .join(alive2, cur["dst"] == F.col("__al2"))
                .select("src", "dst")
                .localCheckpoint(eager=False)
            )
            frame_rows = int(row["sd"])
        k = max(k, int(row["mn"]) + 1)
        drop = (
            deg.filter(F.col("__deg") < k)
            .select("id")
            .localCheckpoint(eager=False)
        )
        out.append(drop.select(
            "id", F.lit(k - 1).cast("long").alias("coreness")
        ))
        d = F.broadcast(drop) if row["n"] <= broadcast_max_drop else drop
        lost = (
            cur.join(d, cur["dst"] == d["id"])
            .groupBy("src")
            .agg(F.count("*").alias("__lost"))
        )
        deg = (
            deg.join(d, "id", "left_anti")
            .join(lost, F.col("id") == lost["src"], "left")
            .select(
                "id",
                (F.col("__deg")
                 - F.coalesce(F.col("__lost"), F.lit(0))).alias("__deg"),
            )
            .localCheckpoint(eager=False)
        )
    else:
        raise RuntimeError(
            f"coreness did not converge within max_rounds={max_rounds}"
        )
    if not out:
        return deg.select("id", F.lit(0).cast("long").alias("coreness"))
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res


def coreness_oracle_sql(edges_sql: str) -> str:
    """DuckDB replica of ``coreness`` as ONE recursive CTE. State rows
    are (k, src, dst) over the alive symmetrized edge set; each
    iteration recounts both endpoint degrees with window functions in a
    single pass (the one-self-reference restriction), drops edges with
    an under-k endpoint, and advances k only on exact-no-op iterations
    — so a node's final coreness is max(k it was alive at) − 1, the
    level that peeled it minus one. Recount-based edge survival equals
    the engine's maintained-degree arithmetic (debits are exact), and
    run-to-completion makes the shared fixpoint the compared output.
    ``edges_sql`` must select columns (src, dst)."""
    return f"""WITH RECURSIVE e0 AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM ({edges_sql}) r0
        UNION ALL
        SELECT dst, src FROM ({edges_sql}) r1) u
      WHERE src <> dst),
    peel AS (
      SELECT 1 AS k, src, dst FROM e0
      UNION ALL
      SELECT CASE WHEN mx = 1 THEN k ELSE k + 1 END AS k, src, dst
      FROM (
        SELECT k, src, dst, ds, dd,
               MAX(CASE WHEN ds < k THEN 1 ELSE 0 END) OVER () AS mx
        FROM (
          SELECT k, src, dst,
                 COUNT(*) OVER (PARTITION BY src) AS ds,
                 COUNT(*) OVER (PARTITION BY dst) AS dd
          FROM peel) t1) t2
      WHERE mx = 0 OR (ds >= k AND dd >= k))
    SELECT src AS id, CAST(MAX(k) - 1 AS BIGINT) AS coreness
    FROM peel GROUP BY src"""


def _symmetrize_simple(
    edges: DataFrame,
    src: str,
    dst: str,
    weight_col: str | None,
) -> DataFrame:
    """Shared symmetrize for the community tier: returns the
    (src, dst, __w) symmetric SIMPLE frame (self-loops dropped).

    Unweighted (``weight_col is None``): the historical contract —
    union-reversed, deduped, every surviving row weighs 1.0.
    Weighted: ``weighted_pagerank``'s exact conventions (VERDICT r11
    #1) — NULL/non-positive weights dropped (no random-walk meaning),
    then parallel edges weight-summed per SYMMETRIC direction, so
    w(a,b) = w(b,a) = Σ of every input weight on (a,b) or (b,a).
    Integer-valued weights keep every downstream sum an exact double,
    which is what makes the engine↔oracle trajectories bit-identical."""
    if weight_col is None:
        e = ensure_parallelism(edges).select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        )
        return (
            e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("__w", F.lit(1.0))
        )
    e = (
        ensure_parallelism(edges)
        .select(
            F.col(src).alias("src"), F.col(dst).alias("dst"),
            F.col(weight_col).cast("double").alias("__w"),
        )
        .filter(F.col("__w").isNotNull() & (F.col("__w") > 0))
    )
    return (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"), "__w"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("__w").alias("__w"))
    )


def _modularity_local_joined(eprep, lab, src, dst, weight_col):
    """``modularity``'s bounded local stats pass (r12, the
    coreness/louvain gate discipline): the heavy part — two |E|-scale
    label joins + the (s_c, d_c) groupBy — runs in numpy off one Arrow
    collect (every sum is over exact integer-valued doubles, so order
    cannot matter), while the ROUNDING-SENSITIVE final arithmetic
    (round/pow/÷, the '<all>' sum of rounded contributions) stays in
    the SAME Spark expressions in ``modularity`` over the tiny
    per-community stats frame — the two paths share every division and
    F.round call, so they cannot diverge at rounding boundaries.
    100 TB graphs never enter the gate.

    Returns the per-community (community, n_nodes, __s, __d, __St)
    frame, or None — caller runs the distributed stats pass — when a
    null src/dst/id/label is present (np.unique/searchsorted raise on
    None in object arrays) or when the labels frame carries DUPLICATE
    ids (ADVICE r12: the distributed equi-join fans each edge out per
    duplicate label row; the searchsorted lookup resolves one label
    per id, so the local path must not claim those inputs)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    epdf = eprep.toPandas()
    lpdf = lab.toPandas()
    if (not _local_codes_ok(epdf[src], epdf[dst], lpdf["id"], lpdf["lab"])
            or bool(lpdf["id"].duplicated().any())):
        return None
    lids = lpdf["id"].to_numpy()
    llabs = lpdf["lab"].to_numpy()
    coms, (lab_codes,) = _sorted_codes(llabs)  # ≡ unique+return_inverse
    C = len(coms)
    n_nodes_a = np.bincount(lab_codes, minlength=C).astype(np.int64)
    s_a = np.zeros(C, dtype=np.float64)
    d_a = np.zeros(C, dtype=np.float64)
    if len(epdf) and C:
        svals = epdf[src].to_numpy()
        dvals = epdf[dst].to_numpy()
        wvals = (epdf["__w"].to_numpy(dtype=np.float64)
                 if weight_col is not None else None)
        endpoints, (sc0, dc0) = _sorted_codes(svals, dvals)
        scode, dcode, w_sym = _np_symmetrize(
            svals, dvals, wvals, endpoints, codes=(sc0, dc0))
        # node-scale hash lookup (r14): one get_indexer over the
        # endpoint universe replaces the edge-scale Python-string
        # binary search — same (label code | -1, found) outputs,
        # lids are duplicate-free (checked above)
        pos = pd.Index(lids).get_indexer(endpoints)
        ep_ok = pos >= 0
        ep_lab = np.where(ep_ok, lab_codes[np.where(ep_ok, pos, 0)], -1)
        lsrc, ok_s = ep_lab[scode], ep_ok[scode]
        ldst, ok_d = ep_lab[dcode], ep_ok[dcode]
        keep = ok_s & ok_d  # unlabeled endpoints drop their edges
        w_k = w_sym[keep]
        lsrc_k, ldst_k = lsrc[keep], ldst[keep]
        np.add.at(d_a, lsrc_k, w_k)
        intra = lsrc_k == ldst_k
        np.add.at(s_a, lsrc_k[intra], w_k[intra])
    lab_field = lab.schema["lab"]
    stats_schema = StructType([
        StructField("community", lab_field.dataType,
                    lab_field.nullable),
        StructField("n_nodes", LongType(), False),
        StructField("__s", DoubleType(), False),
        StructField("__d", DoubleType(), False),
    ])
    stats_pdf = pd.DataFrame({
        "community": coms, "n_nodes": n_nodes_a,
        "__s": s_a, "__d": d_a,
    })
    per_stats = lab.sparkSession.createDataFrame(
        stats_pdf, stats_schema)
    total = per_stats.agg(
        F.coalesce(F.sum("__d"), F.lit(0.0)).alias("__St")
    )
    return per_stats.crossJoin(F.broadcast(total))


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    label_col: str = "community",
    weight_col: str | None = None,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """Newman modularity of a community assignment (Newman & Girvan
    2004): Q = Σ_c [ s_c/S − (d_c/S)² ] over the symmetrized simple
    graph, where S = 2m symmetric edge rows, s_c = symmetric intra-
    community rows and d_c = the community's degree sum — the
    evaluation contract for ``label_propagation``/TrustRank output
    (VERDICT r9 #4): Q near 0 means the labels are no better than
    random cuts, Q ≳ 0.3 means real community structure.

    ``weight_col`` (VERDICT r11 #1) generalizes every term to edge
    weights under ``weighted_pagerank``'s conventions (parallel edges
    weight-summed per symmetric direction, NULL/non-positive dropped):
    Q = Σ_c [ w_c/W − (s_c/W)² ] with W = total symmetric weight,
    w_c = intra-community symmetric weight, s_c = the community's
    WEIGHTED degree sum — so the purchase graph's multiplicities score
    community quality instead of being binarized away. Weighted mode
    returns (community, n_nodes, intra_weight, weight_sum, q_contrib)
    — doubles where the unweighted contract has edge/degree counts;
    integer-valued weights keep every sum an exact double (the
    engine↔oracle parity argument is unchanged).

    Returns one row per community — (community, n_nodes, intra_edges,
    degree_sum, q_contrib) — plus a ``<all>`` total row whose
    q_contrib is Q (sum of the 6-dp-rounded per-community
    contributions, the HT-'<all>' rollup discipline). Nodes appear via
    the LABELS frame, so edge-free labeled nodes count in n_nodes with
    zero stats; unlabeled endpoints drop their edges (label your whole
    node set). Self-loops are dropped (they carry no cut information
    under this formulation).

    Scale shape: two equi-joins of the symmetric edge frame against
    the node-scale label frame, ONE partial-aggregated groupBy to
    (s_c, d_c) per community, the grand total S broadcast back as a
    1-row crossJoin (never an unbounded driver collect) — closed-form,
    no iteration, no window. Under 2·|sym| ≤ ``local_tail_max`` (hard
    gate, 2M default, 0 disables — the coreness/louvain discipline)
    the integer-exact (s_c, d_c, n_nodes) stats pass runs in numpy off
    one bounded Arrow collect while ALL rounding-sensitive arithmetic
    (÷, pow, F.round, the '<all>' sum) stays in the shared Spark
    expressions — the two paths cannot diverge at rounding boundaries.
    Cite: reference has no graph tier; this is the missing evaluation
    beside LPA (SURVEY §2.11)."""
    eprep = _louvain_eprep(edges, src, dst, weight_col)
    lab = labels.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lab")
    )
    joined = None
    if local_tail_max > 0 and 2 * eprep.count() <= local_tail_max:
        joined = _modularity_local_joined(eprep, lab, src, dst, weight_col)
    if joined is None:
        sym = _symmetrize_simple(
            eprep, src, dst, "__w" if weight_col else None
        )
        la = lab.select(F.col("id").alias("__sid"),
                        F.col("lab").alias("lsrc"))
        lb = lab.select(F.col("id").alias("__did"),
                        F.col("lab").alias("ldst"))
        labeled = (
            sym.join(la, sym["src"] == la["__sid"])
            .join(lb, sym["dst"] == lb["__did"])
            .select("lsrc", "ldst", "__w")
        )
        stats = labeled.groupBy(F.col("lsrc").alias("community")).agg(
            F.sum(
                F.when(F.col("lsrc") == F.col("ldst"), F.col("__w"))
                .otherwise(F.lit(0.0))
            ).alias("__s"),
            F.sum("__w").alias("__d"),
        )
        sizes = lab.groupBy(F.col("lab").alias("community")).agg(
            F.count("*").alias("n_nodes")
        )
        total = stats.agg(
            F.coalesce(F.sum("__d"), F.lit(0.0)).alias("__St")
        )
        joined = (
            sizes.join(stats, "community", "left")
            .crossJoin(F.broadcast(total))
        )
    if weight_col is None:
        mass_cols = [
            (F.coalesce(F.col("__s"), F.lit(0.0)) / 2)
            .cast("long").alias("intra_edges"),
            F.coalesce(F.col("__d"), F.lit(0.0))
            .cast("long").alias("degree_sum"),
        ]
        mass_names = ["intra_edges", "degree_sum"]
    else:
        mass_cols = [
            (F.coalesce(F.col("__s"), F.lit(0.0)) / 2)
            .alias("intra_weight"),
            F.coalesce(F.col("__d"), F.lit(0.0)).alias("weight_sum"),
        ]
        mass_names = ["intra_weight", "weight_sum"]
    per = (
        joined
        .select(
            "community",
            "n_nodes",
            *mass_cols,
            # ``+ 0.0`` = the corpus zero-sign convention (VERDICT r10
            # #1): IEEE (-0.0) + 0.0 == +0.0 and x + 0.0 == x otherwise,
            # so a contribution that rounds to zero from below can never
            # stringify as '-0.0' in the driver hash.
            F.when(F.col("__St") == 0, F.lit(0.0)).otherwise(
                F.round(
                    F.coalesce(F.col("__s"), F.lit(0.0)) / F.col("__St")
                    - F.pow(
                        F.coalesce(F.col("__d"), F.lit(0.0))
                        / F.col("__St"),
                        F.lit(2),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("q_contrib"),
        )
    )
    grand = per.agg(
        F.sum("n_nodes").alias("n_nodes"),
        F.sum(mass_names[0]).alias(mass_names[0]),
        F.sum(mass_names[1]).alias(mass_names[1]),
        (F.round(F.coalesce(F.sum("q_contrib"), F.lit(0.0)), 6)
         + F.lit(0.0))
        .alias("q_contrib"),
    ).select(
        F.lit("<all>").alias("community"),
        "n_nodes", *mass_names, "q_contrib",
    )
    return per.unionByName(grand)


def _sym_simple_sql(edges_sql: str, name: str, weighted: bool) -> str:
    """SQL replica of ``_symmetrize_simple`` as one MATERIALIZED CTE
    named ``name`` selecting (src, dst, w): unweighted = union-reversed
    DISTINCT with w = 1.0; weighted = NULL/non-positive dropped then
    weight-summed per symmetric direction (``edges_sql`` then selects
    (src, dst, w))."""
    if not weighted:
        return f"""{name} AS MATERIALIZED (
      SELECT src, dst, 1.0 AS w FROM (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM ({edges_sql}) r0
          UNION ALL
          SELECT dst, src FROM ({edges_sql}) r1) u
        WHERE src <> dst) d)"""
    return f"""{name} AS MATERIALIZED (
      SELECT src, dst, SUM(w) AS w FROM (
        SELECT src, dst, w FROM ({edges_sql}) r0
        WHERE w IS NOT NULL AND w > 0
        UNION ALL
        SELECT dst, src, w FROM ({edges_sql}) r1
        WHERE w IS NOT NULL AND w > 0) u
      WHERE src <> dst GROUP BY src, dst)"""


def modularity_oracle_sql(
    edges_sql: str,
    labels_sql: str,
    weighted: bool = False,
) -> str:
    """DuckDB replica of ``modularity``: identical symmetrize, the same
    two label joins, the same (s_c, d_c) aggregate, per-community
    contributions rounded at 6 dp, the '<all>' row summing the rounded
    contributions. ``ROUND(…) + 0`` normalizes DuckDB's IEEE −0.0 (a
    q_contrib that rounds to zero from below) to +0.0, matching Spark —
    the corpus zero-sign convention (VERDICT r10 #1; this exact site was
    r10's one hash-fail). ``edges_sql`` selects (src, dst) — plus w when
    ``weighted`` (VERDICT r11 #1: the weighted generalization, doubles
    instead of counts); ``labels_sql`` selects (id, lab)."""
    if weighted:
        mass = """COALESCE(t.s_c, 0.0) / 2 AS intra_weight,
             COALESCE(t.d_c, 0.0) AS weight_sum"""
        mass_names = ("intra_weight", "weight_sum")
        mass_total = """SUM(intra_weight), SUM(weight_sum)"""
    else:
        mass = """CAST(COALESCE(t.s_c, 0.0) / 2 AS BIGINT) AS intra_edges,
             CAST(COALESCE(t.d_c, 0.0) AS BIGINT) AS degree_sum"""
        mass_names = ("intra_edges", "degree_sum")
        mass_total = (
            "CAST(SUM(intra_edges) AS BIGINT), CAST(SUM(degree_sum) AS BIGINT)"
        )
    return f"""WITH {_sym_simple_sql(edges_sql, "me0", weighted)},
    mlab AS MATERIALIZED (SELECT id, lab FROM ({labels_sql}) ml),
    mlabeled AS (
      SELECT la.lab AS lsrc, lb.lab AS ldst, s.w
      FROM me0 s JOIN mlab la ON s.src = la.id
                 JOIN mlab lb ON s.dst = lb.id),
    mstats AS (
      SELECT lsrc AS community,
             SUM(CASE WHEN lsrc = ldst THEN w ELSE 0.0 END) AS s_c,
             SUM(w) AS d_c
      FROM mlabeled GROUP BY lsrc),
    msizes AS (
      SELECT lab AS community, COUNT(*) AS n_nodes
      FROM mlab GROUP BY lab),
    mtot AS (SELECT COALESCE(SUM(d_c), 0.0) AS S FROM mstats),
    mper AS (
      SELECT z.community,
             z.n_nodes,
             {mass},
             CASE WHEN mtot.S = 0 THEN 0.0 ELSE ROUND(
               COALESCE(t.s_c, 0.0) / mtot.S
               - POW(COALESCE(t.d_c, 0.0) / mtot.S, 2),
             6) + 0 END AS q_contrib
      FROM msizes z LEFT JOIN mstats t ON z.community = t.community,
           mtot)
    SELECT community, CAST(n_nodes AS BIGINT) AS n_nodes, {mass_names[0]},
           {mass_names[1]}, q_contrib FROM mper
    UNION ALL
    SELECT '<all>', CAST(SUM(n_nodes) AS BIGINT), {mass_total},
           ROUND(COALESCE(SUM(q_contrib), 0.0), 6) + 0
    FROM mper"""


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node + global transitivity —
    the density diagnostics beside ``modularity`` (Watts & Strogatz
    1998; Newman's transitivity): c(v) = tri(v) / (deg(v)·(deg(v)−1)/2)
    over the symmetrized simple graph, 0 for degree-<2 nodes (the
    networkx convention). Returns one row per node — (id, degree,
    triangles, coeff) — plus an ``<all>`` row whose coeff is the GLOBAL
    transitivity 3·|triangles| / |wedges| (wedges = Σ_v C(deg v, 2)),
    with degree = Σ deg and triangles = the distinct triangle count.

    Scale shape: ``triangle_counts``'s degree-ordered orientation
    (wedge volume O(m^{3/2}) regardless of skew) plus one degree agg
    and a node-scale left join; the global row is a 1-row aggregate.
    Cite: reference has no graph tier; extends SURVEY §2.11."""
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    # bare lazy checkpoint (r14: the round_persist variant was probed
    # paired and REGRESSED graph_clustering 4.8→6.6 s — the checkpoint
    # conversion already executes this frame under AQE, and stacking an
    # InMemoryRelation write on top cost more than it saved)
    und = (
        e.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
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
    tri = triangle_counts(und, src="a", dst="b")
    per = (
        deg.join(tri, "id", "left")
        .select(
            "id",
            F.col("__deg").cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0))
            .cast("long").alias("triangles"),
            F.when(
                F.col("__deg") >= 2,
                F.round(
                    F.coalesce(F.col("triangles"), F.lit(0))
                    / (F.col("__deg").cast("double")
                       * (F.col("__deg") - 1) / F.lit(2.0)),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("coeff"),
        )
    )
    grand = per.agg(
        F.sum("degree").alias("degree"),
        (F.sum("triangles") / 3).cast("long").alias("triangles"),
        F.round(
            F.coalesce(
                F.sum("triangles")
                # double before the multiply: deg² in long overflows on
                # billion-degree hubs
                / F.sum(F.col("degree").cast("double")
                        * (F.col("degree") - 1) / F.lit(2.0)),
                F.lit(0.0),
            ),
            6,
        ).alias("coeff"),
    ).select(
        F.lit("<all>").alias("id"), "degree", "triangles", "coeff"
    )
    return per.unionByName(grand)


def clustering_oracle_sql(edges_sql: str) -> str:
    """DuckDB replica of ``clustering_coefficient``: canonical simple
    pairs, textbook id-ordered 3-way triangle join (orientation-
    invariant, so it matches the engine's degree-ordered pass),
    symmetric degrees, identical coefficient arithmetic and the
    '<all>' transitivity row. ``edges_sql`` selects (src, dst)."""
    return f"""WITH ce AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM ({edges_sql}) ge WHERE src <> dst),
    cdeg AS (SELECT id, count(*) AS d FROM (
        SELECT a AS id FROM ce UNION ALL SELECT b FROM ce) u
      GROUP BY id),
    ct AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM ce e1 JOIN ce e2 ON e1.b = e2.a
                      JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b),
    ctri AS (SELECT id, count(*) AS tri FROM (
        SELECT x AS id FROM ct
        UNION ALL SELECT y FROM ct
        UNION ALL SELECT z FROM ct) n
      GROUP BY id),
    cper AS (
      SELECT d.id,
             CAST(d.d AS BIGINT) AS degree,
             CAST(COALESCE(t.tri, 0) AS BIGINT) AS triangles,
             CASE WHEN d.d >= 2 THEN
               ROUND(COALESCE(t.tri, 0) / (d.d * (d.d - 1) / 2.0), 6)
             ELSE 0.0 END AS coeff
      FROM cdeg d LEFT JOIN ctri t ON t.id = d.id)
    SELECT id, degree, triangles, coeff FROM cper
    UNION ALL
    SELECT '<all>', CAST(SUM(degree) AS BIGINT),
           CAST(SUM(triangles) / 3 AS BIGINT),
           ROUND(COALESCE(SUM(triangles)
                 / SUM(degree * (degree - 1) / 2.0), 0.0), 6)
    FROM cper"""


def adamic_adar_topk(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 1000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Adamic–Adar link prediction (Adamic & Adar 2003): for every
    non-adjacent node pair sharing ≥1 common neighbor, score
    AA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w), and return the global
    top-``k`` candidate pairs — the "who should be linked" signal a
    curation pipeline uses for entity linkage / recommendation audits.
    Returns (src, dst, score, rank) with src < dst, rank 1..k by
    (score desc, src, dst) — a total order, so both engines pick the
    identical set.

    Scale shape: candidate pairs are generated as 2-paths through
    common neighbors with deg(w) ≤ ``max_degree`` — the HUB CAP that
    bounds wedge volume at Σ_{deg(w)≤cap} deg(w)² ≤ cap·2m instead of
    the Σ deg² a celebrity node makes quadratic (the standard
    Adamic-Adar practicality; a hub's 1/ln(deg) contribution is also
    the least informative, which is the metric's own point). One
    degree agg, one self-join on the capped apex, one groupBy(pair)
    partial-aggregated score sum, an existing-edge anti-join, and a
    bounded global top-k via TakeOrderedAndProject (orderBy + limit —
    never a full sort materialization). Weak-signal caveat: scores
    round to 6 dp before ranking so float summation order cannot
    reorder ties across engines."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_degree < 2:
        raise ValueError("max_degree must be >= 2")
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("__deg"))
    # apex = common neighbor w with its weight; cap kills hub wedges
    apex = (
        sym.join(deg.filter(F.col("__deg") <= max_degree), "src")
        .select(
            F.col("src").alias("w"), F.col("dst").alias("n"),
            (F.lit(1.0) / F.log(F.col("__deg"))).alias("__wt"),
        )
    )
    l, r = apex.alias("l"), apex.alias("r")
    pairs = (
        l.join(r, (F.col("l.w") == F.col("r.w"))
               & (F.col("l.n") < F.col("r.n")))
        .groupBy(F.col("l.n").alias("src"), F.col("r.n").alias("dst"))
        .agg(F.round(F.sum("l.__wt"), 6).alias("score"))
    )
    existing = sym.filter(F.col("src") < F.col("dst"))
    cand = pairs.join(existing, ["src", "dst"], "left_anti")
    top = cand.orderBy(
        F.col("score").desc(), F.col("src"), F.col("dst")
    ).limit(k)
    # unpartitioned window is safe here: it runs over the ≤k-row
    # TakeOrderedAndProject output, never the candidate frame
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("src"), F.col("dst"))
    return top.select(
        "src", "dst", "score",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def adamic_adar_oracle_sql(
    edges_sql: str, k: int = 50, max_degree: int = 1000
) -> str:
    """DuckDB replica of ``adamic_adar_topk``: identical symmetrize,
    hub-capped apex weights, pair score sum rounded at 6 dp BEFORE
    ranking, existing-edge anti-join, and the same (score desc, src,
    dst) total order."""
    return f"""WITH aae AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM ({edges_sql}) r0
        UNION ALL SELECT dst, src FROM ({edges_sql}) r1) u
      WHERE src <> dst),
    adeg AS (SELECT src AS w, count(*) AS d FROM aae GROUP BY src),
    apex AS (
      SELECT e.src AS w, e.dst AS n, 1.0 / ln(d.d) AS wt
      FROM aae e JOIN adeg d ON d.w = e.src
      WHERE d.d <= {max_degree}),
    prs AS (
      SELECT l.n AS src, r.n AS dst, ROUND(SUM(l.wt), 6) AS score
      FROM apex l JOIN apex r ON l.w = r.w AND l.n < r.n
      GROUP BY 1, 2),
    cand AS (
      SELECT p.src, p.dst, p.score FROM prs p
      WHERE NOT EXISTS (SELECT 1 FROM aae x
                        WHERE x.src = p.src AND x.dst = p.dst)),
    ranked AS (
      SELECT src, dst, score,
             row_number() OVER (ORDER BY score DESC, src, dst) AS rank
      FROM cand)
    SELECT src, dst, score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}"""


def _conductance_local_stats(
    eprep: DataFrame, lab: DataFrame, src: str, dst: str,
    weight_col: str | None,
) -> DataFrame | None:
    """Bounded local stats pass for ``conductance`` (r13, the
    ``_modularity_local_joined`` discipline): the integer-exact
    (cut_c, vol_c, n_nodes) sums run in numpy off one Arrow collect
    while ALL rounding-sensitive arithmetic (min, ÷, F.round, the
    '<all>' row) stays in the shared Spark expressions — the two paths
    cannot diverge at rounding boundaries. Returns the
    (community, n_nodes, __cut, __vol) frame or None (nulls or
    duplicate label ids ⇒ caller stays distributed)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    epdf = eprep.toPandas()
    lpdf = lab.toPandas()
    if (not _local_codes_ok(epdf[src], epdf[dst], lpdf["id"], lpdf["lab"])
            or bool(lpdf["id"].duplicated().any())):
        return None
    lids = lpdf["id"].to_numpy()
    llabs = lpdf["lab"].to_numpy()
    coms, (lab_codes,) = _sorted_codes(llabs)  # ≡ unique+return_inverse
    C = len(coms)
    n_nodes_a = np.bincount(lab_codes, minlength=C).astype(np.int64)
    cut_a = np.zeros(C, dtype=np.float64)
    vol_a = np.zeros(C, dtype=np.float64)
    has = np.zeros(C, dtype=bool)
    if len(epdf) and C:
        svals = epdf[src].to_numpy()
        dvals = epdf[dst].to_numpy()
        wvals = (epdf["__w"].to_numpy(dtype=np.float64)
                 if weight_col is not None else None)
        endpoints, (sc0, dc0) = _sorted_codes(svals, dvals)
        scode, dcode, w_sym = _np_symmetrize(svals, dvals, wvals,
                                             endpoints, codes=(sc0, dc0))
        # node-scale hash lookup (r14, the modularity-local shape):
        # get_indexer over the endpoint universe replaces the
        # edge-scale Python-string binary search — same outputs
        pos = pd.Index(lids).get_indexer(endpoints)
        ep_ok = pos >= 0
        ep_lab = np.where(ep_ok, lab_codes[np.where(ep_ok, pos, 0)], -1)
        lsrc, ok_s = ep_lab[scode], ep_ok[scode]
        ldst, ok_d = ep_lab[dcode], ep_ok[dcode]
        keep = ok_s & ok_d  # unlabeled endpoints drop their edges
        w_k = w_sym[keep]
        lsrc_k, ldst_k = lsrc[keep], ldst[keep]
        np.add.at(vol_a, lsrc_k, w_k)
        boundary = lsrc_k != ldst_k
        np.add.at(cut_a, lsrc_k[boundary], w_k[boundary])
        has[lsrc_k] = True
    lab_field = lab.schema["lab"]
    stats_schema = StructType([
        StructField("community", lab_field.dataType, lab_field.nullable),
        StructField("n_nodes", LongType(), False),
        StructField("__cut", DoubleType(), True),
        StructField("__vol", DoubleType(), True),
    ])
    # edge-less communities carry NULL cut/vol, exactly like the
    # distributed sizes ⟕ stats left join (list-of-tuples, not a
    # pandas float column: NaN would survive as NaN, not NULL)
    rows = [
        (
            c,
            int(n_nodes_a[i]),
            float(cut_a[i]) if has[i] else None,
            float(vol_a[i]) if has[i] else None,
        )
        for i, c in enumerate(coms.tolist())
    ]
    return lab.sparkSession.createDataFrame(rows, stats_schema)


def conductance(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    label_col: str = "community",
    weight_col: str | None = None,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """Conductance of a community assignment — the CUT-quality score
    beside ``modularity``'s density score (Kannan, Vempala & Vetta
    2004): φ(C) = cut(C) / min(vol(C), vol(V∖C)) over the symmetrized
    simple graph, where vol(C) = Σ_{v∈C} deg(v) and cut(C) = edges
    with exactly one endpoint in C. Low φ = few escape routes relative
    to internal mass (a well-separated community); φ near 1 = the
    "community" is mostly boundary. Modularity and conductance fail in
    opposite directions (resolution limit vs. balance blindness), so a
    curation pipeline evaluating LPA output wants BOTH.

    Returns one row per community — (community, n_nodes, cut_edges,
    volume, phi) — plus a ``<all>`` row whose phi is the
    VOLUME-WEIGHTED mean of the per-community φ (the partition-level
    summary; communities with undefined φ — vol 0 or the whole graph —
    are excluded from the mean and carry NULL). Nodes enter via the
    LABELS frame, so edge-free labeled communities appear with zero
    stats and NULL φ; unlabeled endpoints drop their edges.

    ``weight_col`` (r13 — VERDICT r12 #4, the parity argument that
    motivated r12's weighted modularity/Louvain: the user who scores
    weighted communities wants the weighted cut metric too)
    generalizes every term to edge weights under the single
    ``_symmetrize_simple`` weight dialect the whole community tier
    speaks (NULL/non-positive dropped, parallel edges weight-summed
    per symmetric direction): φ(C) = cutw(C) / min(volw(C), W −
    volw(C)) with volw = weighted degree sums and cutw = the weight of
    boundary rows. Weighted mode returns (community, n_nodes,
    cut_weight, volume, phi) — doubles where the unweighted contract
    has counts; integer-valued weights keep every sum an exact double
    (the engine↔oracle parity argument is unchanged).

    Scale shape: IDENTICAL to ``modularity`` — two node-scale label
    equi-joins on the symmetric edge frame, ONE partial-aggregated
    groupBy to (cut_c, vol_c), the grand total S broadcast back as a
    1-row crossJoin; closed-form, no iteration. Per-community φ is
    rounded at 6 dp before the weighted mean so float summation order
    cannot drift the '<all>' row across engines. Cite: reference has
    no graph tier; extends SURVEY §2.11 beside ``modularity``."""
    lab = labels.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lab")
    )
    if weight_col is None:
        zero = F.lit(0)
        cut_name, cast_t = "cut_edges", "long"
    else:
        zero = F.lit(0.0)
        cut_name, cast_t = "cut_weight", "double"
    # Bounded local stats pass (r13, the _modularity_local_joined
    # discipline): integer-exact cut/vol sums in numpy off one Arrow
    # collect; every rounding-sensitive expression below is shared by
    # both paths. 100 TB graphs never enter the gate.
    eprep = _louvain_eprep(edges, src, dst, weight_col)
    combined = None
    if local_tail_max > 0 and 2 * eprep.count() <= local_tail_max:
        combined = _conductance_local_stats(
            eprep, lab, src, dst, weight_col
        )
    if combined is None:
        sym = _symmetrize_simple(
            eprep, src, dst, "__w" if weight_col else None
        )
        la = lab.select(F.col("id").alias("__sid"),
                        F.col("lab").alias("lsrc"))
        lb = lab.select(F.col("id").alias("__did"),
                        F.col("lab").alias("ldst"))
        labeled = (
            sym.join(la, sym["src"] == la["__sid"])
            .join(lb, sym["dst"] == lb["__did"])
            .select("lsrc", "ldst", "__w")
        )
        if weight_col is None:
            stats = labeled.groupBy(F.col("lsrc").alias("community")).agg(
                F.sum(
                    F.when(F.col("lsrc") != F.col("ldst"), F.lit(1))
                    .otherwise(0)
                ).alias("__cut"),
                F.count("*").alias("__vol"),
            )
        else:
            stats = labeled.groupBy(F.col("lsrc").alias("community")).agg(
                F.sum(
                    F.when(F.col("lsrc") != F.col("ldst"), F.col("__w"))
                    .otherwise(F.lit(0.0))
                ).alias("__cut"),
                F.sum("__w").alias("__vol"),
            )
        sizes = lab.groupBy(F.col("lab").alias("community")).agg(
            F.count("*").alias("n_nodes")
        )
        combined = sizes.join(stats, "community", "left")
    total = combined.agg(
        F.coalesce(F.sum("__vol"), zero).alias("__St")
    )
    minvol = F.least(
        F.col("__v").cast("double"), (F.col("__St") - F.col("__v")).cast("double")
    )
    per = (
        combined
        .crossJoin(F.broadcast(total))
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("__cut"), zero)
            .cast(cast_t).alias(cut_name),
            F.coalesce(F.col("__vol"), zero)
            .cast(cast_t).alias("volume"),
            F.col("__St"),
        )
        .withColumn("__v", F.col("volume"))
        .select(
            "community", "n_nodes", cut_name, "volume",
            F.when(
                minvol > 0,
                F.round(F.col(cut_name) / minvol, 6),
            ).otherwise(F.lit(None).cast("double")).alias("phi"),
        )
    )
    grand = per.agg(
        F.sum("n_nodes").alias("n_nodes"),
        F.sum(cut_name).alias(cut_name),
        F.sum("volume").alias("volume"),
        F.round(
            F.sum(
                F.when(F.col("phi").isNotNull(),
                       F.col("phi") * F.col("volume"))
            )
            / F.sum(
                F.when(F.col("phi").isNotNull(), F.col("volume"))
            ),
            6,
        ).alias("phi"),
    ).select(
        F.lit("<all>").alias("community"),
        "n_nodes", cut_name, "volume", "phi",
    )
    return per.unionByName(grand)


def conductance_oracle_sql(
    edges_sql: str,
    labels_sql: str,
    weighted: bool = False,
) -> str:
    """DuckDB replica of ``conductance``: identical symmetrize
    (``_sym_simple_sql`` — the one weight dialect), the same two label
    joins, the same (cut_c, vol_c) aggregate, per-community φ rounded
    at 6 dp, the '<all>' volume-weighted mean over the rounded φ.
    ``edges_sql`` selects (src, dst) — plus w when ``weighted`` (r13:
    doubles instead of counts); ``labels_sql`` selects (id, lab)."""
    if weighted:
        cut_expr = "SUM(CASE WHEN lsrc <> ldst THEN w ELSE 0.0 END)"
        vol_expr = "SUM(w)"
        cut_name = "cut_weight"
        mass_cast = "DOUBLE"
        zero = "0.0"
    else:
        cut_expr = "SUM(CASE WHEN lsrc <> ldst THEN 1 ELSE 0 END)"
        vol_expr = "COUNT(*)"
        cut_name = "cut_edges"
        mass_cast = "BIGINT"
        zero = "0"
    return f"""WITH {_sym_simple_sql(edges_sql, "pe0", weighted)},
    plab AS MATERIALIZED (SELECT id, lab FROM ({labels_sql}) pl),
    plabeled AS (
      SELECT la.lab AS lsrc, lb.lab AS ldst, s.w AS w
      FROM pe0 s JOIN plab la ON s.src = la.id
                 JOIN plab lb ON s.dst = lb.id),
    pstats AS (
      SELECT lsrc AS community,
             {cut_expr} AS cut_c,
             {vol_expr} AS vol_c
      FROM plabeled GROUP BY lsrc),
    psizes AS (
      SELECT lab AS community, COUNT(*) AS n_nodes
      FROM plab GROUP BY lab),
    ptot AS (SELECT COALESCE(SUM(vol_c), {zero}) AS S FROM pstats),
    pper AS (
      SELECT z.community,
             z.n_nodes,
             CAST(COALESCE(t.cut_c, {zero}) AS {mass_cast}) AS {cut_name},
             CAST(COALESCE(t.vol_c, {zero}) AS {mass_cast}) AS volume,
             CASE WHEN least(CAST(COALESCE(t.vol_c, {zero}) AS DOUBLE),
                             CAST(ptot.S - COALESCE(t.vol_c, {zero}) AS DOUBLE))
                       > 0
                  THEN ROUND(CAST(COALESCE(t.cut_c, {zero}) AS DOUBLE)
                    / least(CAST(COALESCE(t.vol_c, {zero}) AS DOUBLE),
                            CAST(ptot.S - COALESCE(t.vol_c, {zero}) AS DOUBLE)),
                  6)
                  ELSE NULL END AS phi
      FROM psizes z LEFT JOIN pstats t ON z.community = t.community,
           ptot)
    SELECT community, CAST(n_nodes AS BIGINT) AS n_nodes, {cut_name},
           volume, phi FROM pper
    UNION ALL
    SELECT '<all>', CAST(SUM(n_nodes) AS BIGINT),
           CAST(SUM({cut_name}) AS {mass_cast}),
           CAST(SUM(volume) AS {mass_cast}),
           ROUND(SUM(CASE WHEN phi IS NOT NULL THEN phi * volume END)
                 / SUM(CASE WHEN phi IS NOT NULL THEN volume END), 6)
    FROM pper"""


def jaccard_topk(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 1000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Jaccard-coefficient link prediction — the set-overlap rival to
    ``adamic_adar_topk`` (Liben-Nowell & Kleinberg 2003): for every
    non-adjacent pair sharing ≥1 common neighbor,
    J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)|, and return the global top-``k``
    pairs as (src, dst, common, score, rank) with src < dst, rank 1..k
    by (score desc, src, dst) — a total order, so both engines pick
    the identical set. Where Adamic–Adar rewards RARE shared
    neighbors, Jaccard normalizes by the pair's combined reach —
    together they bracket the common-neighbor signal family.

    Scale shape: the same hub-capped 2-path wedge generation as
    Adamic–Adar — common neighbors counted only through apexes with
    deg(w) ≤ ``max_degree`` (wedge volume ≤ cap·2m) — then the TRUE
    (uncapped) degrees of u and v arrive by two node-scale equi-joins
    for the union denominator |N(u)|+|N(v)|−|∩| (the cap bounds which
    wedges GENERATE a candidate, never the degrees that score it; the
    docstring states this estimator choice). One degree agg, one apex
    self-join, one groupBy(pair) count, an existing-edge anti-join,
    bounded global top-k via TakeOrderedAndProject. Scores round to
    6 dp before ranking. Cite: reference has no graph tier; extends
    SURVEY §2.11 beside ``adamic_adar_topk``."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_degree < 2:
        raise ValueError("max_degree must be >= 2")
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("__deg"))
    apex = (
        sym.join(deg.filter(F.col("__deg") <= max_degree), "src")
        .select(F.col("src").alias("w"), F.col("dst").alias("n"))
    )
    l, r = apex.alias("l"), apex.alias("r")
    pairs = (
        l.join(r, (F.col("l.w") == F.col("r.w"))
               & (F.col("l.n") < F.col("r.n")))
        .groupBy(F.col("l.n").alias("src"), F.col("r.n").alias("dst"))
        .agg(F.count("*").alias("common"))
    )
    du = deg.select(F.col("src").alias("src"), F.col("__deg").alias("__du"))
    dv = deg.select(F.col("src").alias("dst"), F.col("__deg").alias("__dv"))
    scored = (
        pairs.join(du, "src").join(dv, "dst")
        .select(
            "src", "dst", F.col("common").cast("long").alias("common"),
            F.round(
                F.col("common")
                / (F.col("__du") + F.col("__dv") - F.col("common"))
                .cast("double"),
                6,
            ).alias("score"),
        )
    )
    existing = sym.filter(F.col("src") < F.col("dst"))
    cand = scored.join(existing, ["src", "dst"], "left_anti")
    top = cand.orderBy(
        F.col("score").desc(), F.col("src"), F.col("dst")
    ).limit(k)
    # unpartitioned window is safe here: it runs over the ≤k-row
    # TakeOrderedAndProject output, never the candidate frame
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("src"), F.col("dst"))
    return top.select(
        "src", "dst", "common", "score",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def jaccard_oracle_sql(
    edges_sql: str, k: int = 50, max_degree: int = 1000
) -> str:
    """DuckDB replica of ``jaccard_topk``: identical symmetrize,
    hub-capped wedge counting, TRUE-degree union denominator, 6-dp
    rounding BEFORE ranking, existing-edge anti-join, and the same
    (score desc, src, dst) total order."""
    return f"""WITH jae AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM ({edges_sql}) r0
        UNION ALL SELECT dst, src FROM ({edges_sql}) r1) u
      WHERE src <> dst),
    jdeg AS (SELECT src AS id, count(*) AS d FROM jae GROUP BY src),
    japex AS (
      SELECT e.src AS w, e.dst AS n
      FROM jae e JOIN jdeg d ON d.id = e.src
      WHERE d.d <= {max_degree}),
    jprs AS (
      SELECT l.n AS src, r.n AS dst, count(*) AS common
      FROM japex l JOIN japex r ON l.w = r.w AND l.n < r.n
      GROUP BY 1, 2),
    jsc AS (
      SELECT p.src, p.dst, CAST(p.common AS BIGINT) AS common,
             ROUND(CAST(p.common AS DOUBLE)
                   / (du.d + dv.d - p.common), 6) AS score
      FROM jprs p JOIN jdeg du ON du.id = p.src
                  JOIN jdeg dv ON dv.id = p.dst),
    jcand AS (
      SELECT s.src, s.dst, s.common, s.score FROM jsc s
      WHERE NOT EXISTS (SELECT 1 FROM jae x
                        WHERE x.src = s.src AND x.dst = s.dst)),
    jranked AS (
      SELECT src, dst, common, score,
             row_number() OVER (ORDER BY score DESC, src, dst) AS rank
      FROM jcand)
    SELECT src, dst, common, score, CAST(rank AS BIGINT) AS rank
    FROM jranked WHERE rank <= {k}"""


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002; the
    networkx ``degree_assortativity_coefficient`` convention): the
    Pearson correlation of the endpoint-degree pairs over every
    SYMMETRIC edge row of the simple graph. r > 0 = hubs attach to
    hubs (social graphs), r < 0 = hubs attach to leaves (the
    hub-and-spoke / bipartite-purchase signature), r ≈ 0 = neutral
    wiring — the one-number topology summary a curation pipeline reads
    beside clustering coefficient and coreness before trusting any
    community structure. Returns ONE row: (n_nodes, n_edges,
    assortativity), 6-dp; NULL when degrees are constant (a regular
    graph has no degree variance to correlate).

    Scale shape: one degree agg, two node-scale equi-joins to put
    (deg u, deg v) on each symmetric row, ONE co-moment codegen scan —
    closed-form, no iteration, no window. The symmetric frame makes r
    direction-free (each edge contributes both orderings, the
    undirected convention). Cite: reference has no graph tier; extends
    SURVEY §2.11 beside clustering_coefficient."""
    e = ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("__deg"))
    du = deg.select(F.col("src").alias("src"),
                    F.col("__deg").cast("double").alias("__du"))
    dv = deg.select(F.col("src").alias("dst"),
                    F.col("__deg").cast("double").alias("__dv"))
    paired = sym.join(du, "src").join(dv, "dst")
    x, y = F.col("__du"), F.col("__dv")
    mom = paired.agg(
        F.count("*").alias("__m"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__qx"),
        F.sum(y * y).alias("__qy"),
        F.sum(x * y).alias("__sxy"),
    )
    nodes = deg.agg(F.count("*").alias("__nn"))
    m = F.col("__m").cast("double")
    cov = m * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = m * F.col("__qx") - F.col("__sx") * F.col("__sx")
    vy = m * F.col("__qy") - F.col("__sy") * F.col("__sy")
    ok = (vx > 0) & (vy > 0)
    return mom.crossJoin(F.broadcast(nodes)).select(
        F.col("__nn").cast("long").alias("n_nodes"),
        (F.col("__m") / 2).cast("long").alias("n_edges"),
        # + 0.0 = corpus zero-sign convention (see modularity)
        F.when(ok, F.round(cov / F.sqrt(vx * vy), 6) + F.lit(0.0))
        .otherwise(F.lit(None).cast("double")).alias("assortativity"),
    )


def degree_assortativity_oracle_sql(edges_sql: str) -> str:
    """DuckDB replica of ``degree_assortativity``: identical
    symmetrize, degree joins, and co-moment arithmetic."""
    return f"""WITH dae AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM ({edges_sql}) r0
        UNION ALL SELECT dst, src FROM ({edges_sql}) r1) u
      WHERE src <> dst),
    dad AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d
            FROM dae GROUP BY src),
    dap AS (
      SELECT du.d AS x, dv.d AS y
      FROM dae e JOIN dad du ON du.id = e.src
                 JOIN dad dv ON dv.id = e.dst),
    dam AS (
      SELECT count(*) AS m, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS qx, SUM(y * y) AS qy, SUM(x * y) AS sxy
      FROM dap),
    dan AS (SELECT count(*) AS nn FROM dad)
    SELECT CAST(dan.nn AS BIGINT) AS n_nodes,
           CAST(dam.m / 2 AS BIGINT) AS n_edges,
           CASE WHEN dam.m * dam.qx - dam.sx * dam.sx > 0
                 AND dam.m * dam.qy - dam.sy * dam.sy > 0
                THEN ROUND((dam.m * dam.sxy - dam.sx * dam.sy)
                  / sqrt((dam.m * dam.qx - dam.sx * dam.sx)
                         * (dam.m * dam.qy - dam.sy * dam.sy)), 6) + 0
           END AS assortativity
    FROM dam, dan"""


def _cc_full_local(eprep: DataFrame, max_rounds: int) -> DataFrame | None:
    """The whole min-label fixpoint in ONE bounded driver pass (r13):
    collect the raw projected edges, symmetrize/dedupe/drop-self in
    numpy (codes over the sorted universe, so min-code ≡ min-id), run
    the SYNCHRONOUS neighbor-min rounds — same round semantics and the
    same ``max_rounds`` RuntimeError contract as the distributed loop,
    no pointer jumping — and return (id, component) over non-isolated
    nodes. Exact: labels are ids, no float arithmetic. Returns None on
    null src/dst."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    pdf = eprep.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf["src"], pdf["dst"]):
        return None
    f = eprep.schema["src"]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("component", f.dataType, f.nullable),
    ])
    svals = pdf["src"].to_numpy()
    dvals = pdf["dst"].to_numpy()
    keep = svals != dvals  # self-loops dropped before the node set forms
    svals, dvals = svals[keep], dvals[keep]
    if len(svals) == 0:
        return eprep.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "component": []}), schema)
    ids, (sc0, dc0) = _sorted_codes(svals, dvals)
    n = len(ids)
    keys = np.unique(
        np.concatenate([sc0 * n + dc0, dc0 * n + sc0])
    )  # symmetrized + deduped
    es = keys // n
    ed = keys % n
    lab = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        nl = lab.copy()
        np.minimum.at(nl, ed, lab[es])
        new = np.minimum(lab, nl)
        changed = int((new < lab).sum())
        lab = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within "
            f"max_rounds={max_rounds}"
        )
    out = pd.DataFrame({"id": ids, "component": ids[lab]})
    return eprep.sparkSession.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 60,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """Connected components of the undirected graph by synchronous
    MIN-LABEL propagation to fixpoint — the membership primitive under
    ``label_propagation``'s communities and the dedup tier's cluster
    stars, surfaced as its own operator: every node's component id is
    the SMALLEST node id reachable from it. Returns (id, component)
    over non-isolated nodes (the graph is symmetrized, deduped,
    self-loops dropped — the ``coreness`` conventions).

    Determinism: labels start as the node's own id and each round
    every node simultaneously takes min(own label, neighbor labels);
    labels are monotonically non-increasing so the fixpoint is unique
    and reached in ≤ diameter rounds — no tie-break policy needed at
    all (min is total on the id type).

    Scale shape per round (the ``label_propagation`` dataflow): one
    edges ⋈ labels equi-join on src with a (dst, min) partial
    aggregate — map-side combine bounds the shuffle — one node-scale
    compare join, ONE scalar driver action (the changed-count that
    decides termination), node-scale frames lineage-cut with lazy
    localCheckpoint. Rounds are bounded by the largest component's
    diameter (hub-and-spoke graphs: a handful); for diameter-heavy
    graphs at extreme scale the alternating large-star/small-star
    contraction (Kiveris 2014) halves rounds but re-keys edges every
    round — documented, not needed here. ``max_rounds`` exceeded
    raises rather than returning a silent partial labeling. Cite:
    reference has no graph tier; extends SURVEY §2.11 beside
    coreness/label_propagation."""
    # persist the projected edge list ONCE, lazily (r14 — see
    # pagerank): the gate count right below materializes the blocks;
    # the local collect and the distributed symmetrize read them
    e = _round_persist(ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ))
    # Bounded local tail (r13, the label_propagation discipline): the
    # min-label fixpoint under ~1M edges is pure per-round scheduling
    # floor — below the gate the whole loop (symmetrize, dedupe,
    # synchronous min rounds INCLUDING the max_rounds contract) replays
    # off one Arrow collect, bit-identical (integer/string mins, no
    # float arithmetic anywhere). 100 TB graphs never enter.
    if local_tail_max > 0 and 2 * e.count() <= local_tail_max:
        tail = _cc_full_local(e, max_rounds)
        if tail is not None:  # None ⇒ nulls present, stay distributed
            e.unpersist()
            return tail
    sym = _round_materialize(
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct(),
        prior=e,
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_rounds):
        nb = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(sym["dst"].alias("nid"))
            .agg(F.min("lbl").alias("__nl"))
        )
        stepped = (
            labels.join(nb, labels["id"] == nb["nid"], "left")
            .select(
                "id", "lbl",
                F.least(
                    F.col("lbl"), F.coalesce("__nl", F.col("lbl"))
                ).alias("__new"),
            )
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("__new") < F.col("lbl")).count()
        labels = stepped.select("id", F.col("__new").alias("lbl"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within "
            f"max_rounds={max_rounds}"
        )
    return labels.select("id", F.col("lbl").alias("component"))


def connected_components_oracle_sql(edges_sql: str) -> str:
    """DuckDB replica of ``connected_components`` as ONE recursive CTE:
    the edge set is augmented with self-loops so a single
    comp-to-edges join reads both a node's own label and its
    neighbors' (the one-self-reference restriction); each iteration
    emits the full relabeled state while ANY label decreased and stops
    on the exact-no-op iteration. Labels only decrease, so the
    per-node MIN over all emitted rows is the fixpoint — the identical
    labeling the engine's loop converges to. ``edges_sql`` must select
    (src, dst)."""
    return f"""WITH RECURSIVE cce0 AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM ({edges_sql}) r0
        UNION ALL
        SELECT dst, src FROM ({edges_sql}) r1) u
      WHERE src <> dst),
    cce1 AS MATERIALIZED (
      SELECT src, dst FROM cce0
      UNION ALL
      SELECT DISTINCT src, src FROM cce0),
    comp AS (
      SELECT src AS node, src AS lbl
      FROM (SELECT DISTINCT src FROM cce0) n0
      UNION ALL
      SELECT node, newl FROM (
        SELECT node, newl, oldl,
               MAX(CASE WHEN newl < oldl THEN 1 ELSE 0 END)
                 OVER () AS mx
        FROM (
          SELECT DISTINCT e.dst AS node,
                 MIN(c.lbl) OVER (PARTITION BY e.dst) AS newl,
                 MAX(CASE WHEN e.src = e.dst THEN c.lbl END)
                   OVER (PARTITION BY e.dst) AS oldl
          FROM comp c JOIN cce1 e ON e.src = c.node) t1) t2
      WHERE mx = 1)
    SELECT node AS id, MIN(lbl) AS component
    FROM comp GROUP BY node"""


def _wpagerank_full_local(
    g: DataFrame, iterations: int, d: float
) -> DataFrame | None:
    """Node-scale tail of ``weighted_pagerank`` in ONE bounded driver
    pass (r13): collect the distributed (src, dst, Σw|null) pair frame
    — null weight marks a fully weight-dropped pair whose endpoints
    must stay in the node universe as dangling/unreferenced nodes (the
    ADVICE r11 contract) — and replay the identical per-round
    rank·w/Σ_out w arithmetic in numpy. Float-sum order differences vs
    Spark's partial aggregation are last-ulp and absorbed by the
    query-level 6-dp rounding. Returns None on null src/dst."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    pdf = g.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf["src"], pdf["dst"]):
        return None
    f = g.schema["src"]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("rank", DoubleType(), True),
    ])
    svals = pdf["src"].to_numpy()
    dvals = pdf["dst"].to_numpy()
    wvals = pdf["__w"].to_numpy(dtype=np.float64)
    if len(svals) == 0:
        return g.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "rank": []}), schema)
    # hash-coded (pd.factorize) — see _pagerank_full_local
    codes, ids = pd.factorize(np.concatenate([svals, dvals]))
    ids = np.asarray(ids)
    n = len(ids)
    scode = codes[: len(svals)].astype(np.int64)
    dcode = codes[len(svals):].astype(np.int64)
    live = ~np.isnan(wvals)  # surviving pairs (the e = w-not-null filter)
    ls, ld, lw = scode[live], dcode[live], wvals[live]
    outw = np.zeros(n)
    np.add.at(outw, ls, lw)
    outhas = np.zeros(n, dtype=bool)
    outhas[ls] = True
    dang = ~outhas
    nd = float(n)
    rank = np.full(n, 1.0 / nd)
    for _ in range(iterations):
        dm = float(rank[dang].sum())
        contrib = np.zeros(n)
        np.add.at(contrib, ld, rank[ls] * lw / outw[ls])
        rank = (1.0 - d) / nd + d * (contrib + dm / nd)
    out = pd.DataFrame({"id": ids, "rank": rank})
    return g.sparkSession.createDataFrame(out, schema)


def weighted_pagerank(
    edges: DataFrame,
    weight_col: str = "weight",
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = False,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """Weighted PageRank over a directed edge list (VERDICT r10 #5):
    each node distributes rank proportional to EDGE WEIGHT — the
    contribution along (u, v, w) is rank(u)·w/Σ_out w(u) — instead of
    ``pagerank``'s uniform 1/outdeg split, which is what users of the
    purchase graph expect once edges carry multiplicities or spend.
    Parallel edges are weight-summed per (src, dst) first; rows with a
    NULL or non-positive weight are dropped (a zero-weight edge cannot
    carry rank and a negative one has no random-walk meaning). The
    node universe comes from the UNFILTERED edge list (ADVICE r11): a
    node whose every incident edge is weight-dropped stays in the
    output as a dangling/unreferenced node with baseline rank, exactly
    as ``pagerank`` would keep it. Dangling nodes (no surviving
    out-edge) redistribute uniformly, and ranks sum to 1 every round —
    the exact ``pagerank`` conventions, so the two operators differ
    ONLY in the contribution split.

    Scale shape: identical to ``pagerank`` — per round one edge⋈rank
    join, one partial-aggregated contribution sum, a 1-row dangling
    aggregate broadcast back, lineage cut with lazy localCheckpoint;
    the static per-node frame carries Σ_out w instead of outdeg.
    ``broadcast_ranks=True`` broadcasts the node-scale rank frame so
    the edge frame never shuffles (the executor-sized-node-set hint).
    Cite: reference has no graph tier; extends SURVEY §2.11 beside
    pagerank/trustrank."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # ONE scan of the raw lineage (VERDICT r12 #3): a single
    # groupBy(src, dst) produces BOTH the surviving-edge weight sums
    # (__w — null when every parallel edge was NULL/non-positive, the
    # conditional sum replicating filter-then-sum exactly: a sum of
    # positive weights is itself positive) AND the UNFILTERED pair
    # universe the node frame needs (ADVICE r11: weight-dropped nodes
    # stay dangling with baseline rank). The r11/r12 shape scanned a
    # persisted raw projection twice (filtered agg + union-distinct
    # over 2·|E| raw rows); here the raw lineage runs once and the
    # node dedup runs over the already-deduped pair frame.
    g = _round_persist(
        ensure_parallelism(edges).select(
            F.col(src).alias("src"), F.col(dst).alias("dst"),
            F.col(weight_col).cast("double").alias("__w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum(F.when(F.col("__w") > 0, F.col("__w"))).alias("__w"))
    )  # lazily persisted (r14): the gate count below materializes it
    # Bounded local tail (r13): the data-scale parallel-edge weight
    # aggregation above stays DISTRIBUTED; only the node-scale power
    # iteration replays off one Arrow collect of the already-reduced
    # pair frame when it fits the gate (6-dp-identical; unit-pinned).
    # 100 TB graphs never enter and run the rounds below.
    if local_tail_max > 0 and g.count() <= local_tail_max:
        tail = _wpagerank_full_local(g, iterations, float(damping))
        if tail is not None:  # None ⇒ nulls present, stay distributed
            g.unpersist()
            return tail
    e = g.filter(F.col("__w").isNotNull())
    # explode, not union: ONE scan of the cached pair frame feeds the
    # endpoint dedup (the union form scans the cache twice)
    nodes = (
        g.select(F.explode(F.array("src", "dst")).alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outw = e.groupBy("src").agg(F.sum("__w").alias("__ws"))
    n = nodes.agg(F.count("*").alias("__n"))
    # persisted, not just lazily checkpointed: the static node frame is
    # consumed by every round's join through a NEW plan — exactly the
    # many-consumer chained-frame shape the r12 persist-discipline
    # probe recorded as paying (SCALING.md r12 addendum); released
    # before return alongside g
    base = _round_materialize(
        nodes.join(outw, nodes["id"] == outw["src"], "left")
        .select("id", F.col("__ws").alias("__ws"))
        .crossJoin(F.broadcast(n))
        .select("id", "__ws", "__n")
    )
    ranks = base.select(
        "id", "__ws", "__n", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    d = float(damping)
    for _ in range(iterations):
        dangling = ranks.filter(F.col("__ws").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        live = ranks.filter(F.col("__ws").isNotNull())
        if broadcast_ranks:
            live = F.broadcast(live)
        contribs = (
            e.join(live, e["src"] == F.col("id"))
            .select(
                "dst",
                (F.col("rank") * F.col("__w") / F.col("__ws"))
                .alias("__c"),
            )
            .groupBy("dst")
            .agg(F.sum("__c").alias("__sum"))
        )
        if broadcast_ranks:
            contribs = F.broadcast(contribs)
        ranks = (
            base.crossJoin(F.broadcast(dangling))
            .join(contribs, base["id"] == contribs["dst"], "left")
            .select(
                "id", "__ws", "__n",
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
    # Materialize the returned node-scale frame, then release the
    # edge-scale pair cache (ADVICE r12): the returned frame stays
    # persisted (callers may unpersist); g/base do not outlive the call.
    out = _round_materialize(ranks.select("id", "rank"), prior=g)
    base.unpersist()
    return out


def _wdist_full_local(
    eprep: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame | None:
    """Fixed-round Bellman-Ford in ONE bounded driver pass (r13):
    collect the filtered weighted edges and the seed set, relax in
    numpy. Full relaxation per round is round-for-round identical to
    the distributed frontier-delta (the weighted_distances docstring's
    own equivalence argument), and every distance is an exact min over
    identical per-path double sums — bit-identical output. Returns
    None on null src/dst/seed (caller stays distributed)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    pdf = eprep.toPandas()  # Arrow batch transfer — bounded by the gate
    spdf = seeds.select(
        F.col(seeds.columns[0]).alias("__sid")
    ).distinct().toPandas()
    if not _local_codes_ok(pdf["src"], pdf["dst"]) or bool(
        pd.isna(spdf["__sid"]).any()
    ):
        return None
    f = eprep.schema["src"]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("dist", DoubleType(), True),
    ])
    svals = pdf["src"].to_numpy()
    dvals = pdf["dst"].to_numpy()
    wvals = pdf["__w"].to_numpy(dtype=np.float64)
    seedv = spdf["__sid"].to_numpy()
    # hash-coded (pd.factorize) — see _pagerank_full_local
    codes, ids = pd.factorize(np.concatenate([svals, dvals, seedv]))
    ids = np.asarray(ids)
    n = len(ids)
    if n == 0:
        return eprep.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "dist": []}), schema)
    ne = len(svals)
    scode = codes[:ne].astype(np.int64)
    dcode = codes[ne:2 * ne].astype(np.int64)
    dist = np.full(n, np.inf)
    dist[codes[2 * ne:]] = 0.0
    for _ in range(rounds):
        active = np.isfinite(dist[scode])
        if not active.any():
            break
        cand = np.full(n, np.inf)
        np.minimum.at(
            cand, dcode[active], dist[scode[active]] + wvals[active]
        )
        dist = np.minimum(dist, cand)
    reach = np.isfinite(dist)
    out = pd.DataFrame({"id": ids[reach], "dist": dist[reach]})
    return eprep.sparkSession.createDataFrame(out, schema)


def weighted_distances(
    edges: DataFrame,
    seeds: DataFrame,
    weight_col: str = "weight",
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Weighted shortest-path distance from a SEED SET — fixed-round
    distributed Bellman-Ford (VERDICT r10 #4), the cost/latency
    generalization of ``bfs_distances``'s hop counts: returns
    (id, dist) for every node reachable within ``rounds`` relaxation
    rounds, dist = the minimum total edge weight from any seed (seeds
    at 0.0). Weights must be non-negative, and the contract is
    ENFORCED (ADVICE r11): NULL-weight AND negative-weight edges are
    dropped — a negative weight has no shortest-path meaning under a
    fixed horizon (Bellman-Ford with negative edges needs |V|−1
    rounds plus a cycle check; silently accepting them degraded the
    'shortest' semantics). After r rounds dist(v) is exact over all
    paths of ≤ r edges — the standard fixed-horizon contract (run
    rounds ≥ graph diameter for the full fixpoint).

    Frontier-delta discipline (the BFS shape, carried over): per round
    only the nodes whose distance IMPROVED last round propagate —
    a non-improved node would re-offer exactly the candidates it
    already offered, so frontier-only relaxation is round-for-round
    identical to full relaxation, which is what the UNION-ALL +
    group-min SQL oracle runs and the green row pins. Work per round
    is O(edges-out-of-frontier) + one node-scale min-merge; the
    frontier broadcasts while executor-sized (``broadcast_frontier``),
    and every per-round frame is lineage-cut with lazy
    localCheckpoint. No driver state beyond the loop counter.
    Cite: reference has no graph tier; extends SURVEY §2.11 beside
    bfs_distances."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e0 = (
        ensure_parallelism(edges)
        .select(
            F.col(src).alias("src"), F.col(dst).alias("dst"),
            F.col(weight_col).cast("double").alias("__w"),
        )
        .filter(F.col("__w").isNotNull() & (F.col("__w") >= 0))
    )
    # Bounded local tail (r13): fixed-round relaxation is exact min
    # arithmetic over per-path weight sums — the local replay is
    # bit-identical, not merely 6-dp-identical. The gate count and the
    # collect stay two scans of the (caller-cached) projection rather
    # than paying a second cache write of the doubled symmetric frame.
    # 100 TB graphs never enter the gate.
    if e0.count() <= 2_000_000:
        tail = _wdist_full_local(e0, seeds, rounds)
        if tail is not None:  # None ⇒ nulls present, stay distributed
            return tail
    # distributed rounds re-read the frame every round — materialize
    # (round_materialize — see pagerank)
    e = _round_materialize(e0)
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .select("id", F.lit(0.0).alias("dist"))
        .localCheckpoint(eager=False)
    )
    frontier = dist
    for _ in range(rounds):
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        cand = (
            e.join(f, e["src"] == f["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("__w")).alias("__nd"),
            )
            .groupBy("id")
            .agg(F.min("__nd").alias("__nd"))
        )
        merged = (
            dist.join(cand, "id", "full")
            .select(
                "id",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("__nd"), F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("__nd") < F.col("dist"))
                ).alias("__improved"),
            )
            .localCheckpoint(eager=False)
        )
        frontier = merged.filter(F.col("__improved")).select("id", "dist")
        dist = merged.select("id", "dist")
    return dist



def _louvain_rounds(
    sym: DataFrame,
    labels: DataFrame,
    stot: DataFrame,
    rounds: int,
) -> DataFrame:
    """The shared Louvain move core (distributed path): ``rounds``
    synchronous best-move rounds with the both-endpoints-winner
    disjointness guard, over an already-symmetric weighted frame.

    ``sym`` is (src, dst, __w) and MAY carry self-rows (contracted
    levels represent a community's intra weight as one (c, c, s_c)
    row): candidate weights e_vc come from the src≠dst subset only,
    while ``labels``' __k column — the weighted degree — INCLUDES
    self-row weight. Under that split the closed-form ΔQ
    (2·(e_vb−e_va)/S − 2·k_v·(d_b−d_a+k_v)/S²) is level-invariant: a
    supernode's self-loop moves with it, so it cancels in the intra
    term and only widens k_v — which is exactly why contracted-level
    modularity equals original-graph modularity. ``labels`` is
    (id, com, __k); ``stot`` a 1-row (__S) frame (S is invariant
    across contraction levels)."""
    ev_edges = sym.filter(F.col("src") != F.col("dst"))
    for _ in range(rounds):
        dc = labels.groupBy("com").agg(F.sum("__k").alias("__d"))
        nbl = labels.select(F.col("id").alias("__nid"),
                            F.col("com").alias("__ncom"))
        evc = (
            ev_edges.join(nbl, ev_edges["dst"] == nbl["__nid"])
            .groupBy(F.col("src").alias("__v"),
                     F.col("__ncom").alias("__cand"))
            .agg(F.sum("__w").alias("__evb"))
        )
        evc = _round_materialize(evc)  # consumed twice (evc2 / eva)
        me = labels.select(F.col("id").alias("__v2"),
                           F.col("com").alias("__mycom"),
                           F.col("__k").alias("__kv"))
        evc2 = evc.join(me, evc["__v"] == me["__v2"])
        eva = evc2.filter(F.col("__cand") == F.col("__mycom")).select(
            F.col("__v").alias("__v3"), F.col("__evb").alias("__eva")
        )
        dcb = dc.select(F.col("com").alias("__bcom"),
                        F.col("__d").alias("__db"))
        dca = dc.select(F.col("com").alias("__acom"),
                        F.col("__d").alias("__da"))
        cand = (
            evc2.filter(F.col("__cand") != F.col("__mycom"))
            .join(eva, F.col("__v") == F.col("__v3"), "left")
            .join(dcb, F.col("__cand") == F.col("__bcom"))
            .join(dca, F.col("__mycom") == F.col("__acom"))
            .crossJoin(F.broadcast(stot))
            .select(
                "__v", "__mycom", "__cand",
                (
                    F.floor(
                        (
                            F.lit(2.0)
                            * (F.col("__evb")
                               - F.coalesce(F.col("__eva"), F.lit(0.0)))
                            / F.col("__S")
                            - F.lit(2.0) * F.col("__kv")
                            * (F.col("__db") - F.col("__da")
                               + F.col("__kv"))
                            / (F.col("__S") * F.lit(1.0) * F.col("__S"))
                        ) * F.lit(1_000_000.0) + F.lit(0.5)
                    ) / F.lit(1_000_000.0)
                ).alias("__dq"),
            )
        )
        prop = (
            cand.filter(F.col("__dq") > 0)
            .groupBy("__v", "__mycom")
            .agg(
                F.min(
                    F.struct((-F.col("__dq")).alias("nd"),
                             F.col("__cand").alias("cand"))
                ).alias("__b")
            )
            .select(
                "__v", "__mycom",
                F.col("__b.cand").alias("__cand"),
                (-F.col("__b.nd")).alias("__dq"),
            )
        )
        prop = _round_materialize(prop)  # consumed by touch (2x) + mv
        touch = prop.select(
            F.col("__mycom").alias("__tcom"), "__v", "__cand", "__dq"
        ).unionByName(prop.select(
            F.col("__cand").alias("__tcom"), "__v", "__cand", "__dq"
        ))
        win = (
            touch.groupBy("__tcom")
            .agg(
                F.min(
                    F.struct((-F.col("__dq")).alias("nd"),
                             F.col("__v").alias("v"),
                             F.col("__cand").alias("cand"))
                ).alias("__w2")
            )
            .select(
                "__tcom", F.col("__w2.v").alias("__wv"),
                F.col("__w2.cand").alias("__wcand"),
            )
        )
        win_s = win.select(F.col("__tcom").alias("__ws_com"),
                           F.col("__wv").alias("__ws_v"),
                           F.col("__wcand").alias("__ws_cand"))
        win_t = win.select(F.col("__tcom").alias("__wt_com"),
                           F.col("__wv").alias("__wt_v"),
                           F.col("__wcand").alias("__wt_cand"))
        mv = (
            prop.join(
                win_s,
                (F.col("__mycom") == F.col("__ws_com"))
                & (F.col("__v") == F.col("__ws_v"))
                & (F.col("__cand") == F.col("__ws_cand")),
            )
            .join(
                win_t,
                (F.col("__cand") == F.col("__wt_com"))
                & (F.col("__v") == F.col("__wt_v"))
                & (F.col("__cand") == F.col("__wt_cand")),
            )
            .select(F.col("__v").alias("__mv_v"),
                    F.col("__cand").alias("__mv_cand"))
        )
        labels = _round_materialize(
            labels.join(mv, labels["id"] == mv["__mv_v"], "left")
            .select(
                "id",
                F.coalesce(F.col("__mv_cand"), F.col("com")).alias("com"),
                "__k",
            ),
            prior=labels,
        )
        evc.unpersist()
        prop.unpersist()
    return labels


def _louvain_local_tail(
    sym: DataFrame,
    init_labels: DataFrame | None,
    rounds: int,
) -> DataFrame:
    """Run the Louvain move rounds in ONE bounded driver pass — the
    ``_coreness_local_tail`` discipline (VERDICT r11 #3): collect the
    ≤-cap (src, dst, __w) frame via Arrow (plus the node-scale init
    labels, when given) and replay the EXACT per-round dataflow
    vectorized: weighted degrees/community degrees/candidate weights
    as ``np.add.at`` sums (exact — every addend is an integer-valued
    double), ΔQ elementwise in the identical IEEE expression order
    incl. the 6-dp floor-half-up, and the (−ΔQ, cand) /
    (−ΔQ, v, cand) struct-min orders as ``np.lexsort`` passes over
    SORTED-unique value codes (code order ≡ value order, so integer
    comparisons reproduce the engine's string/int comparisons).
    Returns the (id, com) frame; bit-identical to the distributed
    rounds (unit-pinned: tests/test_round12_ops.py). Returns None —
    caller falls back to the distributed rounds — when a null src/dst
    or init label is present, or when ``init_labels`` carries
    duplicate ids (ADVICE r12: the distributed init join FANS OUT on
    duplicates; the searchsorted lookup cannot, so the local path must
    not claim those inputs)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    pdf = sym.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf["src"], pdf["dst"]):
        return None
    f = sym.schema["src"]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("com", f.dataType, f.nullable),
    ])
    src = pdf["src"].to_numpy()
    dst = pdf["dst"].to_numpy()
    w = pdf["__w"].to_numpy(dtype=np.float64)
    if len(src) == 0:  # ≡ the old np.unique(src) emptiness check
        return sym.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "com": []}), schema)
    ipdf = None
    # one _sorted_codes pass codes the edge endpoints (and the init
    # labels into the same universe) — identical universe and codes to
    # the old unique+searchsorted (symmetric frame ⇒ src∪dst =
    # unique(src), so folding dst in changes nothing)
    if init_labels is not None:
        ipdf = init_labels.select(
            F.col(init_labels.columns[0]).alias("id"),
            F.col(init_labels.columns[1]).alias("lab"),
        ).toPandas()
        if (not _local_codes_ok(ipdf["id"], ipdf["lab"])
                or bool(ipdf["id"].duplicated().any())):
            return None
        universe, (scode, dcode, _ilc) = _sorted_codes(
            src, dst, ipdf["lab"].to_numpy())
    else:
        universe, (scode, dcode) = _sorted_codes(src, dst)
    node_codes = np.unique(scode)  # int codes — cheap
    ids = universe[node_codes]
    full = _louvain_init_full(universe, ids, ipdf)
    full = _louvain_replay(universe, scode, dcode, w, full, rounds)
    out = pd.DataFrame({"id": ids, "com": universe[full[node_codes]]})
    # Arrow batch transfer back out, mirroring the toPandas on the way in
    return sym.sparkSession.createDataFrame(out, schema)


def _louvain_init_full(universe, ids, ipdf):
    """Label-code array over ``universe``: every graph node its own
    id, overridden by the init (id, lab) pandas frame where the id is
    a graph node (the distributed left-join semantics); non-node
    universe positions stay −1."""
    import numpy as np

    lab = np.searchsorted(universe, ids).astype(np.int64)
    full = np.full(len(universe), -1, dtype=np.int64)
    full[lab] = lab
    if ipdf is not None and len(ipdf):
        iid = np.searchsorted(universe, ipdf["id"].to_numpy())
        iid_ok = (iid < len(universe))
        iid_c = np.where(iid_ok, iid, 0)
        iid_ok &= universe[iid_c] == ipdf["id"].to_numpy()
        ilab = np.searchsorted(universe, ipdf["lab"].to_numpy())
        present = iid_ok & (full[iid_c] >= 0)
        full[iid_c[present]] = ilab[present]
    return full


def _louvain_replay(universe, scode, dcode, w, full, rounds):
    """The numpy Louvain move core — the EXACT distributed dataflow
    over coded arrays (see ``_louvain_local_tail``'s docstring for the
    bit-identity argument). ``scode/dcode/w`` form the symmetric
    weighted frame (self-rows allowed: they count in the weighted
    degree, the contracted-level contract, and are excluded from
    candidate weights); ``full`` is the label-code array over
    ``universe``. Returns the updated ``full``."""
    import numpy as np

    U = len(universe)
    # weighted degree INCLUDING self-rows (contracted-level contract)
    k = np.zeros(U, dtype=np.float64)
    np.add.at(k, scode, w)
    S = float(k.sum())
    if S == 0.0:
        return full
    mask = scode != dcode  # candidate weights exclude self-rows
    esrc = scode[mask]
    edst = dcode[mask]
    ew = w[mask]
    node_codes = np.unique(scode)
    for _ in range(rounds):
        # community weighted degree: every node's k into its community
        dcom = np.zeros(U, dtype=np.float64)
        np.add.at(dcom, full[node_codes], k[node_codes])
        keys = esrc * U + full[edst]
        uk, inv = np.unique(keys, return_inverse=True)
        evb = np.zeros(len(uk), dtype=np.float64)
        np.add.at(evb, inv, ew)
        kv = uk // U
        kc = uk % U
        myc = full[kv]
        # e_va lookup: (v, mycom) entry or 0.0 (the distributed coalesce)
        akey = kv * U + myc
        pos = np.searchsorted(uk, akey)
        pos_ok = (pos < len(uk))
        pos_c = np.where(pos_ok, pos, 0)
        eva = np.where(pos_ok & (uk[pos_c] == akey), evb[pos_c], 0.0)
        cand = kc != myc
        kvv = k[kv]
        dq = np.floor(
            (2.0 * (evb - eva) / S
             - 2.0 * kvv * (dcom[kc] - dcom[myc] + kvv) / (S * 1.0 * S))
            * 1_000_000.0 + 0.5
        ) / 1_000_000.0
        sel = cand & (dq > 0)
        if not sel.any():
            continue
        sv, sc, sq, sm = kv[sel], kc[sel], dq[sel], myc[sel]
        # per-node proposal: min(−ΔQ, cand) ≡ lexsort(cand, −ΔQ; v)
        order = np.lexsort((sc, -sq, sv))
        firsts = np.unique(sv[order], return_index=True)[1]
        pv = sv[order][firsts]
        pc = sc[order][firsts]
        pq = sq[order][firsts]
        pm = sm[order][firsts]
        # winner per touched community: min(−ΔQ, v, cand) per tcom
        tcom = np.concatenate([pm, pc])
        tv = np.concatenate([pv, pv])
        tc = np.concatenate([pc, pc])
        tq = np.concatenate([pq, pq])
        worder = np.lexsort((tc, tv, -tq, tcom))
        wfirsts = np.unique(tcom[worder], return_index=True)[1]
        wt = tcom[worder][wfirsts]
        wv = np.full(U, -1, dtype=np.int64)
        wc = np.full(U, -1, dtype=np.int64)
        wv[wt] = tv[worder][wfirsts]
        wc[wt] = tc[worder][wfirsts]
        mv = (wv[pm] == pv) & (wc[pm] == pc) \
            & (wv[pc] == pv) & (wc[pc] == pc)
        full[pv[mv]] = pc[mv]
    return full


def _np_symmetrize(svals, dvals, wvals, universe, keep_self=False,
                   codes=None):
    """Numpy replica of ``_symmetrize_simple`` over raw edge values:
    weighted (``wvals`` given) = NULL/non-positive dropped then
    weight-summed per symmetric direction; unweighted = union-reversed
    DISTINCT with w = 1.0. Self-loops dropped unless ``keep_self``
    (the LPA sym0 contract). Every sum is over integer-valued doubles
    ⇒ exact regardless of order. Returns (scode, dcode, w) coded over
    ``universe``. ``codes`` (r14): the precomputed (scode, dcode)
    int64 pair from ``_sorted_codes`` — skips the per-value
    searchsorted binary search over Python strings."""
    import numpy as np

    if codes is not None:
        a0, b0 = codes
    else:
        a0 = np.searchsorted(universe, svals).astype(np.int64)
        b0 = np.searchsorted(universe, dvals).astype(np.int64)
    U = len(universe)
    if wvals is not None:
        wv = np.asarray(wvals, dtype=np.float64)
        keep = wv > 0  # NaN/NULL compare False — the distributed filter
        a0, b0, wv = a0[keep], b0[keep], wv[keep]
        a = np.concatenate([a0, b0])
        b = np.concatenate([b0, a0])
        ww = np.concatenate([wv, wv])
        if not keep_self:
            ns = a != b
            a, b, ww = a[ns], b[ns], ww[ns]
        key = a * U + b
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.float64)
        np.add.at(sums, inv, ww)
        return (uk // U), (uk % U), sums
    a = np.concatenate([a0, b0])
    b = np.concatenate([b0, a0])
    if not keep_self:
        ns = a != b
        a, b = a[ns], b[ns]
    uk = np.unique(a * U + b)
    return (uk // U), (uk % U), np.ones(len(uk), dtype=np.float64)


def _louvain_full_local(
    eprep: DataFrame,
    src: str,
    dst: str,
    weight_col: str | None,
    init_labels: DataFrame | None,
    rounds: int,
    levels: int,
) -> DataFrame:
    """The whole (multi-level) Louvain run in ONE bounded driver pass:
    collect the RAW projected edge frame (≤ gate rows — half the
    symmetric frame the per-level tail would collect), symmetrize in
    numpy (``_np_symmetrize``, exact), then per level replay the move
    rounds (``_louvain_replay``) and contract locally (one
    integer-exact grouped weight sum, self-rows kept). Skips every
    distributed symmetrize/shuffle — the level-0 fast path behind the
    same ``local_tail_max`` gate; output identical to the distributed
    path (unit-pinned). Returns None — caller falls back to the
    distributed dataflow — on null src/dst/init values or duplicate
    init ids (ADVICE r12, see ``_louvain_local_tail``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    pdf = eprep.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf[src], pdf[dst]):
        return None
    f = eprep.schema[src]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("community", f.dataType, f.nullable),
    ])
    svals = pdf[src].to_numpy()
    dvals = pdf[dst].to_numpy()
    wvals = pdf["__w"].to_numpy(dtype=np.float64) if weight_col else None
    ipdf = None
    vals = [svals, dvals]
    if init_labels is not None:
        ipdf = init_labels.select(
            F.col(init_labels.columns[0]).alias("id"),
            F.col(init_labels.columns[1]).alias("lab"),
        ).toPandas()
        if (not _local_codes_ok(ipdf["id"], ipdf["lab"])
                or bool(ipdf["id"].duplicated().any())):
            return None
        vals.append(ipdf["lab"].to_numpy())
        vals.append(ipdf["id"].to_numpy())
    if len(svals) or (ipdf is not None and len(ipdf)):
        universe, codes = _sorted_codes(*vals)  # ≡ unique+searchsorted
        sc0, dc0 = codes[0], codes[1]
    else:
        universe = np.array([], dtype=object)
        sc0 = dc0 = np.array([], dtype=np.int64)
    scode, dcode, w = _np_symmetrize(svals, dvals, wvals, universe,
                                     codes=(sc0, dc0))
    node_codes = np.unique(scode)
    ids = universe[node_codes]
    if len(ids) == 0:
        return eprep.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "community": []}), schema)
    full = _louvain_init_full(universe, ids, ipdf)
    assign = full[node_codes].copy()  # original node → community code
    for lv in range(levels):
        full = _louvain_replay(universe, scode, dcode, w, full, rounds)
        assign = full[assign] if lv else full[node_codes].copy()
        if lv == levels - 1:
            break
        # local contraction: weight-summed supergraph, self-rows KEPT
        U = len(universe)
        key = full[scode] * U + full[dcode]
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.float64)
        np.add.at(sums, inv, w)
        scode, dcode, w = (uk // U), (uk % U), sums
        cnodes = np.unique(scode)
        full = np.full(U, -1, dtype=np.int64)
        full[cnodes] = cnodes  # contracted level starts at singletons
    out = pd.DataFrame({"id": ids, "community": universe[assign]})
    return eprep.sparkSession.createDataFrame(out, schema)


def _louvain_level(
    sym: DataFrame,
    init_labels: DataFrame | None,
    rounds: int,
    local_tail_max: int,
) -> DataFrame:
    """One Louvain move phase over the symmetric weighted frame:
    bounded local tail when 2·|sym| ≤ ``local_tail_max`` (nodes ⊆ sym
    src values bounds the collect; the one scalar count also
    materializes the lazy checkpoint the rounds would force anyway —
    the coreness gate discipline), else the distributed round core.
    Both paths are output-identical (unit-pinned). Returns (id, com)."""
    if local_tail_max > 0 and 2 * sym.count() <= local_tail_max:
        tail = _louvain_local_tail(sym, init_labels, rounds)
        if tail is not None:  # None ⇒ nulls/dup init ids, stay distributed
            return tail
    deg = _round_materialize(
        sym.groupBy("src")
        .agg(F.sum("__w").alias("__k"))
        .select(F.col("src").alias("id"), "__k")
    )
    stot = deg.agg(F.sum("__k").alias("__S"))
    labels = _louvain_init_labels(deg, init_labels)
    final = _louvain_rounds(sym, labels, stot, rounds)
    # ``final`` is counted+persisted by its last round_materialize, so
    # the node-degree cache can be released here (ADVICE r12) — it does
    # not outlive the level.
    deg.unpersist()
    return final.select("id", "com")


def _louvain_init_labels(
    deg: DataFrame, init_labels: DataFrame | None
) -> DataFrame:
    """(id, com, __k) start frame: each node its own community, or the
    caller's (id, label) frame with own-id fallback for missing
    nodes."""
    if init_labels is None:
        return _round_materialize(deg.select(
            "id", F.col("id").alias("com"), "__k"
        ))
    il = init_labels.select(
        F.col(init_labels.columns[0]).alias("__il_id"),
        F.col(init_labels.columns[1]).alias("__il_com"),
    )
    return _round_materialize(
        deg.join(il, deg["id"] == il["__il_id"], "left")
        .select(
            "id",
            F.coalesce(F.col("__il_com"), F.col("id")).alias("com"),
            "__k",
        )
    )


def louvain_local_move(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
    init_labels: DataFrame | None = None,
    weight_col: str | None = None,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """Deterministic one-level Louvain-style local move (Blondel et al.
    2008, phase 1) — the modularity IMPROVER the evaluation tier was
    missing (VERDICT r10 #3: ``modularity`` can tell the user LPA's
    labels are weak, but nothing offered anything better). Returns
    (id, community) over the symmetrized simple graph, ``modularity``'s
    exact conventions (S = 2m symmetric rows, degree sums, self-loops
    dropped), so the two compose; labels start as each node's own id,
    or as ``init_labels`` (a 2-column (id, label) frame — pass
    ``label_propagation`` output to REFINE it: with the monotone rule
    below the result's Q can never fall below the init's, so
    louvain-over-LPA is guaranteed ≥ LPA). Nodes missing from
    ``init_labels`` fall back to their own id.

    ΔQ for moving v from community a to b, in ``modularity``'s
    Q = Σ_c [s_c/S − (d_c/S)²] terms (all inputs INTEGER counts — or
    integer-valued weights — so both engines compute bit-identical
    doubles):

        ΔQ = 2·(e_vb − e_va)/S − 2·k_v·(d_b − d_a + k_v)/S²

    where e_vc = v's edges into c, k_v = v's degree, d_c = c's degree
    sum (v counted inside a). ΔQ is 6-dp floor-half-up rounded (the
    forecast ``_r6`` discipline) before every comparison so the move
    decisions are engine-portable.

    ``weight_col`` (VERDICT r11 #1) generalizes every term to edge
    weights under ``weighted_pagerank``'s conventions (NULL/non-
    positive dropped, parallel edges weight-summed per symmetric
    direction — ``_symmetrize_simple``, shared with ``modularity``):
    e_vc and k_v become weighted sums and ΔQ optimizes the WEIGHTED
    modularity, so a 40-purchase relationship pulls 40× harder than a
    one-off. Integer-valued weights keep the parity argument intact.

    **Bounded local tail** (VERDICT r11 #3 — the
    ``_coreness_local_tail`` discipline applied verbatim): the move
    rounds' wall is a fixed per-round scheduling floor, so once
    |sym rows| + |nodes| ≤ ``local_tail_max`` (hard gate, default 2M,
    0 disables) the WHOLE move phase runs in one bounded Arrow
    collect + local replay of the identical dataflow — bit-identical
    output (unit-pinned), 100 TB graphs never enter (the gate keeps
    them fully distributed).

    **Q is provably non-decreasing — the synchronous-stampede guard.**
    Naive synchronous local moves are a known trap: thousands of nodes
    join the same target at once (each ΔQ positive ALONE, jointly
    catastrophic — measured Q = −0.09 on the purchase graph), and
    connected singleton pairs swap labels forever. Instead, per round:
    (1) every node proposes its single best strictly-improving move
    (max ΔQ, ties to the smallest target label); (2) a proposal
    survives only if it is the best proposal TOUCHING both its source
    and its target community (best = (ΔQ desc, node asc, target asc),
    a total order because each node proposes once). Surviving moves
    touch pairwise-disjoint community pairs, and ΔQ over disjoint
    pairs is exactly additive (a mover outside communities {c, d}
    changes neither their degree sums nor their intra counts), so
    every round strictly increases Q — no oscillation is possible, and
    up to #communities/2 disjoint moves still apply in parallel per
    round. Fixed ``rounds``, no convergence action.

    Scale shape per round: one edges ⋈ labels equi-join + a
    (node, neighbor-community) partial-aggregated count (≤ |E| rows),
    node-scale joins against the community-degree frame, the 1-row S
    broadcast, and the winner resolution as ordinary min(struct)
    aggregates — never a node-set window; lineage cut with lazy
    localCheckpoint (the LPA round shape). Cite: reference has no
    graph tier; extends SURVEY §2.11 beside
    label_propagation/modularity."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    eprep = _louvain_eprep(edges, src, dst, weight_col)
    if local_tail_max > 0 and 2 * eprep.count() <= local_tail_max:
        full = _louvain_full_local(
            eprep, src, dst, weight_col, init_labels, rounds, levels=1)
        if full is not None:  # None ⇒ nulls/dup init ids, stay distributed
            return full
    sym = _symmetrize_simple(
        eprep, src, dst, "__w" if weight_col else None
    ).localCheckpoint(eager=False).persist()
    labels = _louvain_level(sym, init_labels, rounds, local_tail_max)
    # Materialize the returned node-scale frame, then release the
    # edge-scale caches (ADVICE r12): the returned frame stays
    # persisted (callers may unpersist); sym/labels do not outlive the
    # call.
    out = _round_materialize(
        labels.select("id", F.col("com").alias("community")),
        prior=labels,  # unpersist is a no-op on the local-tail frame
    )
    sym.unpersist()
    return out


def _louvain_eprep(
    edges: DataFrame, src: str, dst: str, weight_col: str | None
) -> DataFrame:
    """Projected raw edge frame shared by the gate/full-local path and
    the distributed symmetrize: (src, dst[, __w]). Materialized (r13):
    the gate count, the local tail's Arrow collect and the distributed
    symmetrize each re-ran the upstream graph build otherwise (a lazy
    localCheckpoint's consumers recompute its lineage — the
    round_materialize finding)."""
    cols = [F.col(src).alias(src), F.col(dst).alias(dst)]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("__w"))
    # lazily persisted (r14): every caller's gate count is the first
    # action over this frame and materializes the blocks; r13's eager
    # count inside round_materialize duplicated it
    return _round_persist(ensure_parallelism(edges).select(*cols))


def louvain_multilevel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    levels: int = 2,
    rounds: int = 4,
    init_labels: DataFrame | None = None,
    weight_col: str | None = None,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """Full multi-level Louvain (Blondel et al. 2008, phases 1+2 —
    VERDICT r11 #2): alternate ``louvain_local_move``'s guarded
    synchronous move phase with graph CONTRACTION — communities become
    supernodes, edges weight-sum into superedges, intra-community
    weight becomes the supernode's self-loop — and re-run the mover on
    the contracted graph, ``levels`` times. This is where Louvain's
    real modularity gains live: one-level moves shift single nodes,
    contracted-level moves merge whole communities at once.

    Returns (id, community) over the ORIGINAL node ids (labels
    composed down through the levels). Q is non-decreasing across
    rounds AND levels: contraction preserves modularity exactly
    (degree sums, intra weights, and S are invariant under the
    supernode representation — the self-loop carries s_c and cancels
    in ΔQ's intra term, see ``_louvain_rounds``), and every move phase
    is the guarded non-decreasing mover. Contracted graphs are
    inherently weighted, so the weighted core (VERDICT r11 #1) is the
    prerequisite this builds on; level-0 weights come from
    ``weight_col`` (or 1.0 — contraction weights are then integer edge
    counts, keeping engine↔oracle sums exact either way).

    Scale shape: level 0 is ``louvain_local_move``'s exact dataflow;
    each contraction is ONE edges⋈labels double equi-join +
    partial-aggregated groupBy to the superedge frame (strictly
    smaller than its input — ≤ alive communities² and in practice a
    sliver); later levels run on community-scale frames and hit the
    bounded local tail almost immediately. Oracle:
    ``louvain_multilevel_oracle_sql`` unrolls every level's rounds and
    contraction as CTEs. Cite: reference has no graph tier; extends
    SURVEY §2.11 beside louvain_local_move."""
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    eprep = _louvain_eprep(edges, src, dst, weight_col)
    if local_tail_max > 0 and 2 * eprep.count() <= local_tail_max:
        full = _louvain_full_local(
            eprep, src, dst, weight_col, init_labels, rounds, levels)
        if full is not None:  # None ⇒ nulls/dup init ids, stay distributed
            return full
    sym = _symmetrize_simple(
        eprep, src, dst, "__w" if weight_col else None
    ).localCheckpoint(eager=False).persist()
    prior_sym = sym
    labels = _louvain_level(sym, init_labels, rounds, local_tail_max)
    mapping = labels
    for lv in range(1, levels):
        ls = labels.select(F.col("id").alias("__ls_id"),
                           F.col("com").alias("__ls_com"))
        ld = labels.select(F.col("id").alias("__ld_id"),
                           F.col("com").alias("__ld_com"))
        sym = (
            sym.join(ls, sym["src"] == ls["__ls_id"])
            .join(ld, sym["dst"] == ld["__ld_id"])
            .groupBy(F.col("__ls_com").alias("src"),
                     F.col("__ld_com").alias("dst"))
            .agg(F.sum("__w").alias("__w"))
        )
        sym = _round_materialize(sym, prior=prior_sym)
        prior_sym = sym
        contract_src = labels
        labels = _louvain_level(sym, None, rounds, local_tail_max)
        sl = labels.select(F.col("id").alias("__sl_id"),
                           F.col("com").alias("__sl_com"))
        mapping = _round_materialize(
            mapping.join(sl, mapping["com"] == sl["__sl_id"])
            .select("id", F.col("__sl_com").alias("com")),
            prior=mapping,
        )
        if lv > 1:
            # level-(lv−1) labels are fully consumed (sym + mapping
            # both materialized); the lv==1 frame IS the old mapping,
            # already released via prior=mapping above (ADVICE r12).
            contract_src.unpersist()
    # Materialize the returned node-scale frame, then release the
    # remaining caches (ADVICE r12): the returned frame stays persisted
    # (callers may unpersist); sym/labels do not outlive the call.
    out = _round_materialize(
        mapping.select("id", F.col("com").alias("community")),
        prior=mapping,
    )
    if labels is not mapping:
        labels.unpersist()
    prior_sym.unpersist()
    return out


def _louvain_round_ctes(
    tag: str, sym_name: str, prev: str, rounds: int
) -> tuple[list[str], str]:
    """Emit the per-round Louvain move CTEs (the ``_louvain_rounds``
    replica): over the already-symmetric weighted CTE ``sym_name``
    (src, dst, w — self-rows excluded from candidate weights, matching
    the engine's ev_edges filter) and the label CTE ``prev`` (id, com,
    k). ``lS`` (the shared 1-row S CTE) must exist in scope — S is
    level-invariant so every level references the same one. Returns
    (cte_parts, final_label_cte)."""
    parts = []
    for t in range(rounds):
        cur = f"{tag}l{t + 1}"
        parts.append(f"""
    {tag}dc{t} AS MATERIALIZED (
      SELECT com, SUM(k) AS d FROM {prev} GROUP BY com),
    {tag}evc{t} AS MATERIALIZED (
      SELECT s.src AS v, l.com AS cand, SUM(s.w) AS evb
      FROM {sym_name} s JOIN {prev} l ON s.dst = l.id
      WHERE s.src <> s.dst GROUP BY 1, 2),
    {tag}cnd{t} AS (
      SELECT c.v, me.com AS mycom, c.cand,
             floor((2.0 * (c.evb - coalesce(ev.evb, 0.0)) / lS.S
                    - 2.0 * me.k * (db.d - da.d + me.k)
                      / (lS.S * 1.0 * lS.S))
                   * 1000000.0 + 0.5) / 1000000.0 AS dq
      FROM {tag}evc{t} c
      JOIN {prev} me ON me.id = c.v
      LEFT JOIN {tag}evc{t} ev ON ev.v = c.v AND ev.cand = me.com
      JOIN {tag}dc{t} db ON db.com = c.cand
      JOIN {tag}dc{t} da ON da.com = me.com
      CROSS JOIN lS
      WHERE c.cand <> me.com),
    {tag}prop{t} AS MATERIALIZED (
      SELECT v, mycom, cand, dq FROM (
        SELECT v, mycom, cand, dq, row_number() OVER (
                 PARTITION BY v ORDER BY dq DESC, cand ASC) AS rn
        FROM {tag}cnd{t} WHERE dq > 0) p
      WHERE rn = 1),
    {tag}win{t} AS (
      SELECT tcom, v, cand FROM (
        SELECT tcom, v, cand, row_number() OVER (
                 PARTITION BY tcom ORDER BY dq DESC, v ASC, cand ASC
               ) AS rn
        FROM (SELECT mycom AS tcom, v, cand, dq FROM {tag}prop{t}
              UNION ALL
              SELECT cand AS tcom, v, cand, dq FROM {tag}prop{t}) u) w
      WHERE rn = 1),
    {tag}mv{t} AS (
      SELECT p.v, p.cand
      FROM {tag}prop{t} p
      JOIN {tag}win{t} ws ON ws.tcom = p.mycom AND ws.v = p.v
                    AND ws.cand = p.cand
      JOIN {tag}win{t} wt ON wt.tcom = p.cand AND wt.v = p.v
                    AND wt.cand = p.cand),
    {cur} AS MATERIALIZED (
      SELECT l.id, coalesce(m.cand, l.com) AS com, l.k
      FROM {prev} l LEFT JOIN {tag}mv{t} m ON m.v = l.id)""")
        prev = cur
    return parts, prev


def louvain_labels_oracle_sql(
    edges_sql: str,
    rounds: int = 8,
    init_labels_sql: str | None = None,
    weighted: bool = False,
) -> str:
    """DuckDB replica of ``louvain_local_move`` as UNROLLED round CTEs
    (the _pagerank_oracle discipline): identical symmetrize, degree
    frame, per-round (node, neighbor-community) weights, the same
    integer-derived ΔQ with the same 6-dp floor-half-up rounding, the
    same per-node proposal pick, and the same both-endpoints winner
    filter (row_number windows here — the total order (ΔQ desc, node
    asc, target asc) makes the mechanisms select identically). Returns
    a parenthesized subquery selecting (id, lab) — feed it to
    ``modularity_oracle_sql`` as ``labels_sql``. ``init_labels_sql``
    (a subquery selecting (id, lab)) mirrors the engine's
    ``init_labels`` refinement mode; ``weighted`` mirrors
    ``weight_col`` (``edges_sql`` then selects (src, dst, w))."""
    if init_labels_sql is None:
        l0 = "l0 AS (SELECT id, id AS com, k FROM ldeg)"
    else:
        l0 = f"""l0 AS MATERIALIZED (
      SELECT d.id, coalesce(il.lab, d.id) AS com, d.k
      FROM ldeg d LEFT JOIN ({init_labels_sql}) il ON il.id = d.id)"""
    parts, prev = _louvain_round_ctes("", "lsym", "l0", rounds)
    return f"""(WITH {_sym_simple_sql(edges_sql, "lsym", weighted)},
    ldeg AS MATERIALIZED (
      SELECT src AS id, SUM(w) AS k FROM lsym GROUP BY src),
    lS AS (SELECT SUM(k) AS S FROM ldeg),
    {l0},{",".join(parts)}
    SELECT id, com AS lab FROM {prev})"""


def louvain_multilevel_oracle_sql(
    edges_sql: str,
    levels: int = 2,
    rounds: int = 4,
    init_labels_sql: str | None = None,
    weighted: bool = False,
) -> str:
    """DuckDB replica of ``louvain_multilevel``: every level's move
    rounds unrolled via ``_louvain_round_ctes``, each contraction as
    one double-label-join + weight-summing groupBy (self-rows kept —
    they carry intra weight into the next level's degrees exactly as
    the engine does), level labels composed back down to original node
    ids at the end. S (``lS``) is computed once at level 0 and shared
    — it is invariant under contraction. Returns a parenthesized
    subquery selecting (id, lab)."""
    if init_labels_sql is None:
        l0 = "a0l0 AS (SELECT id, id AS com, k FROM mdeg0)"
    else:
        l0 = f"""a0l0 AS MATERIALIZED (
      SELECT d.id, coalesce(il.lab, d.id) AS com, d.k
      FROM mdeg0 d LEFT JOIN ({init_labels_sql}) il ON il.id = d.id)"""
    ctes = [
        _sym_simple_sql(edges_sql, "m0sym", weighted),
        """mdeg0 AS MATERIALIZED (
      SELECT src AS id, SUM(w) AS k FROM m0sym GROUP BY src)""",
        "lS AS (SELECT SUM(k) AS S FROM mdeg0)",
        l0,
    ]
    parts, prev = _louvain_round_ctes("a0", "m0sym", "a0l0", rounds)
    ctes.extend(parts)
    finals = [prev]
    for lv in range(1, levels):
        ctes.append(f"""m{lv}sym AS MATERIALIZED (
      SELECT ls.com AS src, ld.com AS dst, SUM(s.w) AS w
      FROM m{lv - 1}sym s JOIN {finals[-1]} ls ON s.src = ls.id
                JOIN {finals[-1]} ld ON s.dst = ld.id
      GROUP BY 1, 2)""")
        ctes.append(f"""mdeg{lv} AS MATERIALIZED (
      SELECT src AS id, SUM(w) AS k FROM m{lv}sym GROUP BY src)""")
        ctes.append(
            f"a{lv}l0 AS (SELECT id, id AS com, k FROM mdeg{lv})"
        )
        parts, prev = _louvain_round_ctes(f"a{lv}", f"m{lv}sym",
                                          f"a{lv}l0", rounds)
        ctes.extend(parts)
        finals.append(prev)
    sel = f"SELECT b0.id, b{levels - 1}.com AS lab FROM {finals[0]} b0"
    for lv in range(1, levels):
        sel += (f"\n    JOIN {finals[lv]} b{lv}"
                f" ON b{lv}.id = b{lv - 1}.com")
    return f"""(WITH {",".join(ctes)}
    {sel})"""


def _leiden_refine(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """Leiden's refinement step (Traag, Waltman & van Eck 2019, the
    connectivity-restoring phase): split every community of ``labels``
    (an (id, com) frame) into its CONNECTED COMPONENTS over the
    intra-community subgraph of ``sym``; each node's refined id is the
    smallest member id reachable inside its community (the
    ``connected_components`` min-label fixpoint — deterministic, no
    tie policy needed), nodes with no intra-community edge become
    singletons under their own id. Splitting a disconnected community
    into components NEVER decreases Q (no intra edge is lost and
    Σd_i² < (Σd_i)² for ≥2 parts), which is what makes the refinement
    safe to insert between move and contraction. Returns
    (id, refined)."""
    la = labels.select(F.col("id").alias("__ri"),
                       F.col("com").alias("__rc"))
    lb = labels.select(F.col("id").alias("__rj"),
                       F.col("com").alias("__rd"))
    intra = (
        sym.join(la, sym["src"] == F.col("__ri"))
        .join(lb, sym["dst"] == F.col("__rj"))
        .filter(F.col("__rc") == F.col("__rd"))
        .select("src", "dst")
    )
    cc = connected_components(intra)
    return (
        labels.join(cc, labels["id"] == cc["id"], "left")
        .select(labels["id"],
                F.coalesce(cc["component"], labels["id"]).alias("refined"))
    )


def _np_cc_min_label(es, ed, U):
    """Vectorized min-label connected components over coded symmetric
    edges: per round one np.minimum.at neighbor gather + a
    pointer-jump shortcut (labels only decrease and always name a
    same-component node, so the fixpoint is the component min — the
    ``connected_components`` labeling, in O(E·log n) worst case).
    Returns the label array over ``U`` codes (identity for isolated
    codes)."""
    import numpy as np

    lab = np.arange(U, dtype=np.int64)
    while True:
        prev = lab
        nl = lab.copy()
        if len(es):
            np.minimum.at(nl, ed, lab[es])
        nl = np.minimum(nl, nl[nl])
        lab = nl
        if np.array_equal(lab, prev):
            return lab


def _np_leiden_refine(scode, dcode, full, U):
    """Numpy replica of ``_leiden_refine`` over coded arrays: connected
    components of the intra-community subgraph (codes over a SORTED
    universe, so min-code ≡ the distributed min-id convention).
    Returns the refined array over ``U`` codes (identity outside)."""
    m = (full[scode] == full[dcode]) & (scode != dcode)
    return _np_cc_min_label(scode[m], dcode[m], U)


def _leiden_full_local(
    eprep: DataFrame,
    src: str,
    dst: str,
    weight_col: str | None,
    init_labels: DataFrame | None,
    rounds: int,
    levels: int,
) -> DataFrame:
    """The whole leiden run in ONE bounded driver pass (the
    ``_louvain_full_local`` discipline): collect the raw projected
    edge frame (≤ gate rows), symmetrize in numpy, then per level
    replay the move rounds (``_louvain_replay``), refine via the
    vectorized min-label component pass, contract by the refined
    partition with the coarse communities as the next level's start,
    and finish with the connectivity pass over the level-0 frame.
    Output identical to the distributed path (unit-pinned:
    tests/test_round13_ops.py). Returns None — caller falls back to
    the distributed dataflow — on null src/dst/init values or
    duplicate init ids (ADVICE r12)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    pdf = eprep.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf[src], pdf[dst]):
        return None
    f = eprep.schema[src]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("community", f.dataType, f.nullable),
    ])
    svals = pdf[src].to_numpy()
    dvals = pdf[dst].to_numpy()
    wvals = pdf["__w"].to_numpy(dtype=np.float64) if weight_col else None
    ipdf = None
    vals = [svals, dvals]
    if init_labels is not None:
        ipdf = init_labels.select(
            F.col(init_labels.columns[0]).alias("id"),
            F.col(init_labels.columns[1]).alias("lab"),
        ).toPandas()
        if (not _local_codes_ok(ipdf["id"], ipdf["lab"])
                or bool(ipdf["id"].duplicated().any())):
            return None
        vals.append(ipdf["lab"].to_numpy())
        vals.append(ipdf["id"].to_numpy())
    if len(svals) or (ipdf is not None and len(ipdf)):
        universe, codes = _sorted_codes(*vals)  # ≡ unique+searchsorted
        sc0, dc0 = codes[0], codes[1]
    else:
        universe = np.array([], dtype=object)
        sc0 = dc0 = np.array([], dtype=np.int64)
    scode, dcode, w = _np_symmetrize(svals, dvals, wvals, universe,
                                     codes=(sc0, dc0))
    node_codes0 = np.unique(scode)
    ids = universe[node_codes0]
    if len(ids) == 0:
        return eprep.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "community": []}), schema)
    U = len(universe)
    scode0, dcode0 = scode, dcode  # level-0 frame for the final pass
    full = _louvain_init_full(universe, ids, ipdf)
    chain = node_codes0.copy()  # original node → current-level node code
    node_codes = node_codes0
    for lv in range(levels):
        full = _louvain_replay(universe, scode, dcode, w, full, rounds)
        if lv == levels - 1:
            break
        refined = _np_leiden_refine(scode, dcode, full, U)
        chain = refined[chain]
        # contraction by the refined partition, self-rows KEPT
        key = refined[scode] * U + refined[dcode]
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.float64)
        np.add.at(sums, inv, w)
        scode, dcode, w = (uk // U), (uk % U), sums
        # next level starts from the COARSE partition (the Leiden
        # init): each refined supernode opens in its move-phase
        # community (all members share one com by construction)
        new_full = np.full(U, -1, dtype=np.int64)
        new_full[refined[node_codes]] = full[node_codes]
        full = new_full
        node_codes = np.unique(scode)
    coarse = full[chain]  # label codes per original node
    full_coarse = np.full(U, -1, dtype=np.int64)
    full_coarse[node_codes0] = coarse
    refined_final = _np_leiden_refine(scode0, dcode0, full_coarse, U)
    out = pd.DataFrame({
        "id": ids, "community": universe[refined_final[node_codes0]]})
    return eprep.sparkSession.createDataFrame(out, schema)


def leiden(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    levels: int = 2,
    rounds: int = 4,
    init_labels: DataFrame | None = None,
    weight_col: str | None = None,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """Leiden-style community detection (Traag, Waltman & van Eck
    2019 — VERDICT r12 #6): ``louvain_multilevel``'s guarded move +
    contraction alternation with the REFINEMENT phase in between.
    Plain Louvain provably produces internally DISCONNECTED
    communities (Traag et al. 2019 §2: a node bridging two parts of
    its community can move away and orphan them); Leiden's fix is to
    contract by a REFINED partition — here each community's connected
    components (``_leiden_refine``) — while the contracted level's
    move phase STARTS from the coarse partition, so whole
    subcommunities can relocate without ever gluing disconnected
    pieces into one supernode. A final refinement pass over the
    original graph then guarantees the returned communities are
    internally connected (asserted in tests/test_round13_ops.py);
    every phase is Q-non-decreasing (guarded moves by construction,
    contraction Q-invariant, component splits strictly raise Q on
    disconnected communities), so Q ≥ the one-level mover's at the
    same rounds. Returns (id, community) over the original node ids;
    the community id is the smallest member id of its connected
    component (the ``connected_components`` convention).

    Determinism: the move rounds are ``louvain_local_move``'s fixed
    dataflow; the refinement is a min-label fixpoint (unique, no tie
    policy); the composed trajectory is replicated by
    ``leiden_oracle_sql`` as unrolled CTEs with recursive-CTE
    component passes.

    Scale shape: level-0 moves are the louvain round dataflow (bounded
    local tail under the gate); each refinement adds one double
    equi-join + the ``connected_components`` min-label rounds (per
    round: one edges ⋈ labels join + a (dst, min) partial aggregate —
    diameter-bounded, and intra-community diameters are small by
    construction); contraction and later levels run on
    community-scale frames. Cite: reference has no graph tier; extends
    SURVEY §2.11 beside louvain_multilevel."""
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    eprep = _louvain_eprep(edges, src, dst, weight_col)
    if local_tail_max > 0 and 2 * eprep.count() <= local_tail_max:
        full = _leiden_full_local(
            eprep, src, dst, weight_col, init_labels, rounds, levels)
        if full is not None:  # None ⇒ nulls/dup init ids, stay distributed
            return full
    sym0 = _symmetrize_simple(
        eprep, src, dst, "__w" if weight_col else None
    ).localCheckpoint(eager=False).persist()
    sym = sym0
    prior_sym = None  # contracted frames only — sym0 lives to the end
    labels = _louvain_level(sym, init_labels, rounds, local_tail_max)
    assign = None  # original id → current-level node id
    for _ in range(1, levels):
        refined = _round_materialize(_leiden_refine(sym, labels))
        rinit = (
            refined.join(labels, "id")
            .groupBy("refined")
            .agg(F.min("com").alias("lab"))
        )
        rs = refined.select(F.col("id").alias("__cs_id"),
                            F.col("refined").alias("__cs_c"))
        rd = refined.select(F.col("id").alias("__cd_id"),
                            F.col("refined").alias("__cd_c"))
        sym = (
            sym.join(rs, sym["src"] == rs["__cs_id"])
            .join(rd, sym["dst"] == rd["__cd_id"])
            .groupBy(F.col("__cs_c").alias("src"),
                     F.col("__cd_c").alias("dst"))
            .agg(F.sum("__w").alias("__w"))
        )
        sym = _round_materialize(sym, prior=prior_sym)
        prior_sym = sym
        old_labels = labels
        if assign is None:
            assign = _round_materialize(
                refined.select("id", F.col("refined").alias("cur")))
        else:
            assign = _round_materialize(
                assign.join(refined,
                            assign["cur"] == refined["id"])
                .select(assign["id"], F.col("refined").alias("cur")),
                prior=assign,
            )
        labels = _louvain_level(sym, rinit, rounds, local_tail_max)
        old_labels.unpersist()
        refined.unpersist()
    if assign is None:
        coarse = labels.select("id", "com")
    else:
        coarse = assign.join(
            labels.select(F.col("id").alias("__fl_id"), "com"),
            assign["cur"] == F.col("__fl_id"),
        ).select(assign["id"], "com")
    # final connectivity pass over the ORIGINAL graph: every returned
    # community is one connected component of its induced subgraph
    out = _round_materialize(
        _leiden_refine(sym0, coarse)
        .select("id", F.col("refined").alias("community"))
    )
    labels.unpersist()
    if assign is not None:
        assign.unpersist()
    if prior_sym is not None:
        prior_sym.unpersist()
    sym0.unpersist()
    return out


def _cc_ctes(tag: str, intra_cte: str) -> tuple[list[str], str]:
    """Recursive-CTE connected components over an already-symmetric
    self-loop-free edge CTE (the ``connected_components_oracle_sql``
    pattern, instanced with a ``tag`` prefix so several passes compose
    in one WITH RECURSIVE list). Returns (ctes, final_name) where
    final selects (id, component)."""
    return [
        f"""{tag}e1 AS MATERIALIZED (
      SELECT src, dst FROM {intra_cte}
      UNION ALL
      SELECT DISTINCT src, src FROM {intra_cte})""",
        f"""{tag}comp AS (
      SELECT src AS node, src AS lbl
      FROM (SELECT DISTINCT src FROM {intra_cte}) n0
      UNION ALL
      SELECT node, newl FROM (
        SELECT node, newl, oldl,
               MAX(CASE WHEN newl < oldl THEN 1 ELSE 0 END)
                 OVER () AS mx
        FROM (
          SELECT DISTINCT e.dst AS node,
                 MIN(c.lbl) OVER (PARTITION BY e.dst) AS newl,
                 MAX(CASE WHEN e.src = e.dst THEN c.lbl END)
                   OVER (PARTITION BY e.dst) AS oldl
          FROM {tag}comp c JOIN {tag}e1 e ON e.src = c.node) t1) t2
      WHERE mx = 1)""",
        f"""{tag}cc AS MATERIALIZED (
      SELECT node AS id, MIN(lbl) AS component
      FROM {tag}comp GROUP BY node)""",
    ], f"{tag}cc"


def _leiden_refine_ctes(
    tag: str, sym_cte: str, labels_cte: str
) -> tuple[list[str], str]:
    """SQL replica of ``_leiden_refine``: intra-community edges of
    ``sym_cte`` under ``labels_cte`` (an (id, com) CTE), recursive-CTE
    components, own-id fallback. Returns (ctes, refined_name) where
    refined selects (id, refined)."""
    ctes = [f"""{tag}intra AS MATERIALIZED (
      SELECT s.src, s.dst
      FROM {sym_cte} s JOIN {labels_cte} ls ON s.src = ls.id
                       JOIN {labels_cte} ld ON s.dst = ld.id
      WHERE ls.com = ld.com AND s.src <> s.dst)"""]
    cc, ccname = _cc_ctes(tag, f"{tag}intra")
    ctes.extend(cc)
    ctes.append(f"""{tag}ref AS MATERIALIZED (
      SELECT l.id, COALESCE(c.component, l.id) AS refined
      FROM {labels_cte} l LEFT JOIN {ccname} c ON c.id = l.id)""")
    return ctes, f"{tag}ref"


def leiden_oracle_sql(
    edges_sql: str,
    levels: int = 2,
    rounds: int = 4,
    init_labels_sql: str | None = None,
    weighted: bool = False,
) -> str:
    """DuckDB replica of ``leiden``: every level's move rounds
    unrolled via ``_louvain_round_ctes``, each refinement as a
    recursive-CTE component pass over the intra-community subgraph
    (``_leiden_refine_ctes``), contraction by the refined partition
    with the coarse communities as the next level's init, the final
    connectivity pass over the level-0 graph. Returns a parenthesized
    subquery selecting (id, lab) — feed it to ``modularity_oracle_sql``
    as ``labels_sql``."""
    if init_labels_sql is None:
        l0 = "z0l0 AS (SELECT id, id AS com, k FROM zdeg0)"
    else:
        l0 = f"""z0l0 AS MATERIALIZED (
      SELECT d.id, coalesce(il.lab, d.id) AS com, d.k
      FROM zdeg0 d LEFT JOIN ({init_labels_sql}) il ON il.id = d.id)"""
    ctes = [
        _sym_simple_sql(edges_sql, "z0sym", weighted),
        """zdeg0 AS MATERIALIZED (
      SELECT src AS id, SUM(w) AS k FROM z0sym GROUP BY src)""",
        "lS AS (SELECT SUM(k) AS S FROM zdeg0)",
        l0,
    ]
    parts, prev = _louvain_round_ctes("z0", "z0sym", "z0l0", rounds)
    ctes.extend(parts)
    level_labels = [prev]  # (id, com) per level
    refs = []  # refined (id, refined) per contraction
    for lv in range(1, levels):
        rctes, rname = _leiden_refine_ctes(
            f"zr{lv}", f"z{lv - 1}sym", level_labels[-1])
        ctes.extend(rctes)
        refs.append(rname)
        ctes.append(f"""zri{lv} AS MATERIALIZED (
      SELECT r.refined AS id, MIN(l.com) AS lab
      FROM {rname} r JOIN {level_labels[-1]} l ON l.id = r.id
      GROUP BY r.refined)""")
        ctes.append(f"""z{lv}sym AS MATERIALIZED (
      SELECT rs.refined AS src, rd.refined AS dst, SUM(s.w) AS w
      FROM z{lv - 1}sym s JOIN {rname} rs ON s.src = rs.id
                JOIN {rname} rd ON s.dst = rd.id
      GROUP BY 1, 2)""")
        ctes.append(f"""zdeg{lv} AS MATERIALIZED (
      SELECT src AS id, SUM(w) AS k FROM z{lv}sym GROUP BY src)""")
        ctes.append(f"""z{lv}l0 AS MATERIALIZED (
      SELECT d.id, coalesce(il.lab, d.id) AS com, d.k
      FROM zdeg{lv} d LEFT JOIN zri{lv} il ON il.id = d.id)""")
        parts, prev = _louvain_round_ctes(f"z{lv}", f"z{lv}sym",
                                          f"z{lv}l0", rounds)
        ctes.extend(parts)
        level_labels.append(prev)
    if levels == 1:
        coarse = f"(SELECT id, com FROM {level_labels[0]})"
    else:
        sel = f"SELECT c0.id, cl.com AS com FROM {refs[0]} c0"
        prev_alias = "c0"
        for i in range(1, len(refs)):
            sel += (f"\n      JOIN {refs[i]} c{i}"
                    f" ON c{i}.id = {prev_alias}.refined")
            prev_alias = f"c{i}"
        sel += (f"\n      JOIN {level_labels[-1]} cl"
                f" ON cl.id = {prev_alias}.refined")
        coarse = f"({sel})"
    ctes.append(f"zcoarse AS MATERIALIZED (SELECT id, com FROM {coarse} zc)")
    fctes, fname = _leiden_refine_ctes("zf", "z0sym", "zcoarse")
    ctes.extend(fctes)
    return f"""(WITH RECURSIVE {",".join(ctes)}
    SELECT id, refined AS lab FROM {fname})"""


def _hits_full_local(eprep: DataFrame, iterations: int) -> DataFrame | None:
    """The whole HITS loop in ONE bounded driver pass (r13, the
    ``_pagerank_full_local`` discipline): collect the raw projected
    edges, dedupe locally (the distributed path's .distinct()), replay
    the textbook a←Σh / normalize / h←Σa rounds in numpy with the
    identical expression order. Per-node float sums and the L2 norms
    accumulate in a different order than Spark's partial aggregation —
    last-ulp differences absorbed by the query-level 6-dp rounding (the
    hits_scores docstring's own tolerance argument). Returns None on
    null src/dst (caller stays distributed)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    pdf = eprep.toPandas()  # Arrow batch transfer — bounded by the gate
    if not _local_codes_ok(pdf["src"], pdf["dst"]):
        return None
    f = eprep.schema["src"]
    schema = StructType([
        StructField("id", f.dataType, f.nullable),
        StructField("hub", DoubleType(), True),
        StructField("authority", DoubleType(), True),
    ])
    svals = pdf["src"].to_numpy()
    dvals = pdf["dst"].to_numpy()
    if len(svals) == 0:
        return eprep.sparkSession.createDataFrame(
            pd.DataFrame({"id": [], "hub": [], "authority": []}), schema)
    # hash-coded (pd.factorize) — see _pagerank_full_local
    codes, ids = pd.factorize(np.concatenate([svals, dvals]))
    ids = np.asarray(ids)
    n = len(ids)
    keys = (
        codes[: len(svals)].astype(np.int64) * n
        + codes[len(svals):].astype(np.int64)
    )
    uk = np.unique(keys)  # the distributed path's .distinct()
    es = uk // n
    ed = uk % n
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(iterations):
        araw = np.zeros(n)
        np.add.at(araw, ed, hub[es])
        an = float(np.sqrt(np.sum(araw * araw)))
        auth = araw / an if an > 0 else np.zeros(n)
        hraw = np.zeros(n)
        np.add.at(hraw, es, auth[ed])
        hn = float(np.sqrt(np.sum(hraw * hraw)))
        hub = hraw / hn if hn > 0 else np.zeros(n)
    out = pd.DataFrame({"id": ids, "hub": hub, "authority": auth})
    return eprep.sparkSession.createDataFrame(out, schema)


def hits_scores(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    broadcast_scores: bool = False,
    local_tail_max: int = 2_000_000,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, the power-iteration
    formulation) over a directed edge list — the natural centrality
    pair for BIPARTITE-ish graphs where PageRank's single score
    conflates the two roles (purchase graph: a customer is a good HUB
    when it buys from good suppliers; a supplier a good AUTHORITY when
    good hubs buy from it). Parallel edges are deduped. Returns
    (id, hub, authority) for every node appearing as src or dst.

    Fixed-dataflow determinism (the pagerank discipline): scores start
    at 1.0; each round computes a ← Σ_in h then L2-normalizes a, then
    h ← Σ_out a and L2-normalizes h — the textbook update order, every
    expression written identically in the SQL oracle so both engines
    walk one trajectory (sums of identical doubles in Spark's partial
    aggregation vs DuckDB's serial sum agree because every
    intermediate is an exact small-integer-derived double in round 1
    and 6-dp divergence never accumulates past the final rounding; the
    green driver row IS the check). An all-zero side (no edges) yields
    zeros rather than a divide-by-zero.

    Scale shape per round: two edge⋈score equi-joins with partial-
    aggregated sums, two 1-row L2-norm aggregates broadcast back
    (never a driver collect), lineage cut with lazy localCheckpoint.
    ``broadcast_scores=True`` broadcasts the node-scale score frame so
    the edge frame never shuffles. Cite: reference has no graph tier;
    extends SURVEY §2.11 beside pagerank/weighted_pagerank."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # persist the projected edge list ONCE, lazily (r14 — see
    # pagerank): the gate count right below materializes the blocks;
    # local collect and distributed rounds read them
    e0 = _round_persist(ensure_parallelism(edges).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ))
    # Bounded local tail (r13, the label_propagation discipline):
    # below the hard gate the whole loop replays off one Arrow collect
    # (6-dp-identical; unit-pinned); 100 TB graphs never enter.
    if local_tail_max > 0 and e0.count() <= local_tail_max:
        tail = _hits_full_local(e0, iterations)
        if tail is not None:  # None ⇒ nulls present, stay distributed
            e0.unpersist()
            return tail
    e = _round_materialize(e0.distinct(), prior=e0)
    nodes = _round_materialize(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    scores = nodes.select(
        "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    )
    for _ in range(iterations):
        s_in = F.broadcast(scores) if broadcast_scores else scores
        araw = (
            e.join(s_in, e["src"] == s_in["id"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("__ar"))
        )
        a0 = nodes.join(araw, nodes["id"] == araw["dst"], "left").select(
            "id", F.coalesce(F.col("__ar"), F.lit(0.0)).alias("__ar")
        )
        anorm = a0.agg(
            F.sqrt(F.sum(F.col("__ar") * F.col("__ar"))).alias("__an")
        )
        a1 = (
            a0.crossJoin(F.broadcast(anorm))
            .select(
                "id",
                F.when(F.col("__an") > 0,
                       F.col("__ar") / F.col("__an"))
                .otherwise(F.lit(0.0)).alias("auth"),
            )
            .localCheckpoint(eager=False)
        )
        a_in = F.broadcast(a1) if broadcast_scores else a1
        hraw = (
            e.join(a_in, e["dst"] == a_in["id"])
            .groupBy("src")
            .agg(F.sum("auth").alias("__hr"))
        )
        h0 = nodes.join(hraw, nodes["id"] == hraw["src"], "left").select(
            "id", F.coalesce(F.col("__hr"), F.lit(0.0)).alias("__hr")
        )
        hnorm = h0.agg(
            F.sqrt(F.sum(F.col("__hr") * F.col("__hr"))).alias("__hn")
        )
        h1 = (
            h0.crossJoin(F.broadcast(hnorm))
            .select(
                "id",
                F.when(F.col("__hn") > 0,
                       F.col("__hr") / F.col("__hn"))
                .otherwise(F.lit(0.0)).alias("hub"),
            )
            .localCheckpoint(eager=False)
        )
        scores = (
            h1.join(a1.select(F.col("id").alias("__aid"), "auth"),
                    h1["id"] == F.col("__aid"))
            .select("id", "hub", "auth")
            .localCheckpoint(eager=False)
        )
    return scores.select("id", "hub", F.col("auth").alias("authority"))

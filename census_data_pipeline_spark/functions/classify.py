"""In-engine supervised classification: full-batch logistic regression
trained by gradient descent as a deterministic Spark dataflow
(SURVEY.md §2.11 ⊕ — the learned quality-classifier stage of a
curation pipeline, e.g. the GPT-3/CCNet "looks like the reference
corpus" filter, trained INSIDE the engine rather than exported to a
single-node ML stack).

The training loop follows the kmeans_lloyd / pca_power discipline:

- a FIXED iteration count (no convergence test on data values);
- every model state rounded to 6 dp at the same points on both engines,
  so an ANSI-SQL oracle replicates the exact trajectory by unrolling
  rounds as CTEs;
- model state lives in a ONE-ROW DataFrame that is broadcast into each
  pass — the data is never collected, and each round costs exactly one
  scan of the (checkpointed) standardized feature frame plus a 1-row
  aggregate.

Scale shape: features are standardized once (one aggregate pass, means
and stds broadcast back); each GD round is map-side arithmetic followed
by a partial-aggregated global mean — the shuffle carries ONE row per
partition per round. At 100 TB the per-round cost is a single
whole-stage-codegen scan; the model (d+1 doubles) is trivially
broadcastable at any realistic feature count. This is exactly how
distributed full-batch LR runs on a real cluster (each executor
computes its partial gradient; the driver-side state is one weight
vector — here kept as a 1-row frame so even that never leaves the JVM).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from census_data_pipeline_spark.sources.catalog import ensure_parallelism


def _dlit(v) -> Column:
    """A double literal that preserves NULL model state (a fold with an
    empty train side yields NULL gradients; NULL must stay NULL through
    every later round, exactly as the 1-row-frame formulation behaved)."""
    return F.lit(None).cast("double") if v is None else F.lit(float(v))


def _sql_dlit(v) -> str:
    """SQL text of the exact double literal ``_dlit`` builds — the
    shortest round-trip decimal parsed back by Java's Double.parseDouble
    (string→double cast), so the parsed plan holds the bit-identical
    double. Used by the fused GD rounds, where building thousands of
    Column objects through py4j measurably dominated the round (r14:
    ~0.27 s/round of pure expression construction at ANY data scale)."""
    return (
        "CAST(NULL AS DOUBLE)" if v is None
        else f"CAST('{float(v)!r}' AS DOUBLE)"
    )


def _row1(spark, cols: dict) -> DataFrame:
    """One-row literal DataFrame (model/statistics state). Replaces the
    chained crossJoin(broadcast(...)) model frames: the VALUES are the
    same doubles the chained plan produced (collected from the identical
    Spark aggregate), but the frame plans as a flat 1-row scan instead
    of a round-deep Catalyst tree."""
    return spark.range(1).select(
        *[_dlit(v).alias(k) for k, v in cols.items()]
    )


def _logreg_fit(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    iterations: int,
    lr: float,
):
    """Shared GD loop behind ``logreg_train`` (coefficient rows),
    ``logreg_calibration`` (reliability bins), ``logreg_auc`` and
    ``logreg_holdout_eval``: standardize once, run the fixed rounds,
    return (z frame, final 1-row weight frame, names, margin builder,
    1-row standardization frame — holdout scoring standardizes unseen
    rows with the TRAINING statistics). Semantics and rounding points
    unchanged from the original inline loop.

    r13 shape (the MLlib treeAggregate discipline): each round is ONE
    partial-aggregated scan of the checkpointed z frame whose 1-row
    result — the UPDATED weights, every rounding still computed by the
    identical Spark expressions — is collected to the driver (d+1
    doubles, strictly less driver traffic than the BroadcastExchange
    the previous 1-row-frame formulation shipped per round) and fed
    back as literals. The previous shape chained round-deep
    crossJoin(broadcast(w)) plans through lazy localCheckpoints, and
    its cost at ANY data scale was dominated by driver-side Catalyst
    work: 8 rounds × (analyze+optimize+codegen of an ever-deeper tree)
    ≈ seconds per fit while the sf0.1 execution itself was <0.3 s
    (measured; OPTIMIZATION_r13.md). Flat per-round plans keep the
    driver O(1) per round at 100 TB too."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    names = [n for n, _ in features]
    # persist the EVALUATED label/feature projection, not bare
    # localCheckpoint (the round_materialize finding: consumers of a
    # lazy localCheckpoint recompute its lineage): feature expressions
    # are routinely string-heavy (length/replace over full documents),
    # and without the cache every GD round — plus the st aggregate —
    # would re-run them over the source scan
    raw = ensure_parallelism(df).select(
        label.cast("double").alias("__y"),
        *[expr.cast("double").alias(n) for n, expr in features],
    ).persist()
    strow = raw.agg(
        *[F.round(F.avg(n), 6).alias(f"__m_{n}") for n in names],
        *[F.round(F.stddev_pop(n), 6).alias(f"__s_{n}") for n in names],
    ).first()
    spark = df.sparkSession
    st = _row1(spark, {k: strow[k] for k in strow.asDict()})
    # z stays a plain projection of the cached raw frame: the per-round
    # standardization arithmetic is trivial against cached numeric
    # columns, and one cached frame per fit beats two
    z = raw.select(
        "__y",
        *[
            F.round(
                (F.col(n) - _dlit(strow[f"__m_{n}"]))
                / _dlit(strow[f"__s_{n}"]), 6
            ).alias(n)
            for n in names
        ],
    )
    wb = 0.0
    wf = {n: 0.0 for n in names}
    for _ in range(iterations):
        marg = _dlit(wb) + sum(
            (_dlit(wf[n]) * F.col(n) for n in names), F.lit(0.0)
        )
        r = F.lit(1.0) / (F.lit(1.0) + F.exp(-marg)) - F.col("__y")
        upd = z.agg(
            F.round(_dlit(wb) - F.lit(lr) * F.round(F.avg(r), 6), 6)
            .alias("__b"),
            *[
                F.round(
                    _dlit(wf[n])
                    - F.lit(lr) * F.round(F.avg(r * F.col(n)), 6), 6
                ).alias(f"__w_{n}")
                for n in names
            ],
        ).first()
        wb = upd["__b"]
        wf = {n: upd[f"__w_{n}"] for n in names}
    w = _row1(spark, {"__b": wb, **{f"__w_{n}": wf[n] for n in names}})
    margin = lambda: (  # noqa: E731 — rebuilt per round against fresh cols
        F.col("__b")
        + sum((F.col(f"__w_{n}") * F.col(n) for n in names), F.lit(0.0))
    )
    return z, w, names, margin, st


def _logreg_fit_multi(
    prep: DataFrame,
    label_col: str,
    names: list[str],
    train_conds: list[Column],
    iterations: int,
    lr: float,
) -> list[dict]:
    """Fused K-model GD (r14 — VERDICT r13 #3): fit every model of a
    CV / learning-curve family in ONE scan per round via conditional
    aggregates — ``avg(when(cond, e))`` aggregates exactly the rows
    ``filter(cond)`` would, in the same per-partition order over the
    same cached frame, so each model's trajectory is arithmetically
    identical to ``_logreg_fit`` run on ``prep.filter(cond)`` (the
    identical Spark expressions produce the identical doubles; the
    round-6 points are unchanged). K·(d+1) aggregate expressions per
    round replace K independent round jobs: the per-round job count
    drops K-fold at every data scale, and at 100 TB the train fold is
    scanned once per round instead of K times.

    ``prep`` must be persisted with ``label_col`` (double) and the
    feature columns (double) already evaluated. Returns one dict per
    model: {"wb", "wf": {name: w}, "m": {name}, "s": {name}} — weights
    and the train-fold standardization stats, all collected scalars
    produced by the same Spark round-6 expressions ``_logreg_fit``
    collects."""
    kk = len(train_conds)
    stat_exprs = []
    for i, cond in enumerate(train_conds):
        for n in names:
            stat_exprs.append(
                F.round(F.avg(F.when(cond, F.col(n))), 6)
                .alias(f"__m_{i}_{n}")
            )
            stat_exprs.append(
                F.round(F.stddev_pop(F.when(cond, F.col(n))), 6)
                .alias(f"__s_{i}_{n}")
            )
    srow = prep.agg(*stat_exprs).first()
    models = [
        {
            "m": {n: srow[f"__m_{i}_{n}"] for n in names},
            "s": {n: srow[f"__s_{i}_{n}"] for n in names},
            "wb": 0.0,
            "wf": {n: 0.0 for n in names},
        }
        for i in range(kk)
    ]
    # ONE reusable base projection (built through py4j ONCE): the label,
    # each model's train flag and each model's standardized features.
    # Per round only the residuals change, and those are parsed SQL over
    # these stable column names — Column-object construction through
    # py4j was ~0.27 s/round (measured, r14), pure driver overhead at
    # every data scale. The arithmetic is untouched: projecting
    # z/cond/r as columns and aggregating them evaluates the identical
    # double expressions on the identical rows in the identical
    # partition order as the previous inline-in-aggregate formulation.
    base_cols = [F.col(label_col).alias("__y")]
    for i, cond in enumerate(train_conds):
        base_cols.append(cond.alias(f"__c_{i}"))
        base_cols.extend(
            F.round(
                (F.col(n) - _dlit(models[i]["m"][n]))
                / _dlit(models[i]["s"][n]), 6
            ).alias(f"__z_{i}_{n}")
            for n in names
        )
    base = prep.select(*base_cols)
    one, lr_s = _sql_dlit(1.0), _sql_dlit(lr)
    for _ in range(iterations):
        rcols, exprs = [], []
        for i in range(kk):
            wb, wf = models[i]["wb"], models[i]["wf"]
            # exact grouping of the py4j tree this replaces:
            # wb + ((((0.0 + w1*z1) + w2*z2) + ...) + wd*zd)
            acc = _sql_dlit(0.0)
            for n in names:
                acc = f"({acc} + ({_sql_dlit(wf[n])} * __z_{i}_{n}))"
            marg = f"({_sql_dlit(wb)} + {acc})"
            rcols.append(
                F.expr(
                    f"(({one} / ({one} + exp(-{marg}))) - __y)"
                ).alias(f"__r_{i}")
            )
            exprs.append(
                F.expr(
                    f"round({_sql_dlit(wb)} - ({lr_s} * "
                    f"round(avg(CASE WHEN __c_{i} THEN __r_{i} END), 6)"
                    f"), 6)"
                ).alias(f"__b_{i}")
            )
            exprs.extend(
                F.expr(
                    f"round({_sql_dlit(wf[n])} - ({lr_s} * "
                    f"round(avg(CASE WHEN __c_{i} THEN "
                    f"(__r_{i} * __z_{i}_{n}) END), 6)), 6)"
                ).alias(f"__w_{i}_{n}")
                for n in names
            )
        upd = base.select("*", *rcols).agg(*exprs).first()
        for i in range(kk):
            models[i]["wb"] = upd[f"__b_{i}"]
            models[i]["wf"] = {n: upd[f"__w_{i}_{n}"] for n in names}
    return models


def _logreg_margin_lit(model: dict, names: list[str]) -> Column:
    """Margin over the standardized features as one literal expression
    (train-stats z, then w·z + b) — the zt/crossJoin(st)/crossJoin(w)
    arithmetic of ``logreg_holdout_eval`` on identical literal
    operands."""
    z = {
        n: F.round(
            (F.col(n) - _dlit(model["m"][n])) / _dlit(model["s"][n]), 6
        )
        for n in names
    }
    return _dlit(model["wb"]) + sum(
        (_dlit(model["wf"][n]) * z[n] for n in names), F.lit(0.0)
    )


def logreg_train(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    iterations: int = 8,
    lr: float = 0.5,
) -> DataFrame:
    """Train binary logistic regression by full-batch gradient descent.

    ``label`` must evaluate to 0.0/1.0; ``features`` is an ordered list
    of (name, expression). Features are z-score standardized (population
    std; mean/std rounded to 6 dp, z rounded to 6 dp) so one learning
    rate fits all scales and the oracle sees identical inputs. Weights
    start at zero; each round computes p = sigmoid(b + w·z), the mean
    gradient (rounded 6 dp), and the update w ← round(w − lr·g, 6).

    Returns one row per coefficient: (feature, weight, train_accuracy)
    with feature = 'bias' first, accuracy = share of rows where the
    final margin's sign matches the label (margin rounded 6 dp before
    the sign test so both engines agree at the boundary)."""
    z, w, names, margin, _st = _logreg_fit(df, label, features,
                                            iterations, lr)
    acc = (
        z.crossJoin(F.broadcast(w))
        .agg(
            F.round(
                F.avg(
                    F.when(
                        (F.round(margin(), 6) >= 0) == (F.col("__y") == 1.0),
                        F.lit(1.0),
                    ).otherwise(F.lit(0.0))
                ),
                6,
            ).alias("__acc")
        )
    )
    coef = w.crossJoin(F.broadcast(acc))
    rows = [
        coef.select(
            F.lit("bias").alias("feature"),
            F.col("__b").alias("weight"),
            F.col("__acc").alias("train_accuracy"),
        )
    ] + [
        coef.select(
            F.lit(n).alias("feature"),
            F.col(f"__w_{n}").alias("weight"),
            F.col("__acc").alias("train_accuracy"),
        )
        for n in names
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _logreg_oracle_parts(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    iterations: int = 8,
    lr: float = 0.5,
):
    """Shared CTE assembly behind ``logreg_oracle_sql`` and
    ``logreg_calibration_oracle_sql``: the unrolled GD rounds. Returns
    (ctes, final_weight_cte, margin_expr, names)."""
    names = [n for n, _ in features_sql]
    feat_sel = ", ".join(f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql)
    st_sel = ", ".join(
        f"round(avg({n}), 6) AS m_{n}, round(stddev_pop({n}), 6) AS s_{n}"
        for n in names
    )
    z_sel = ", ".join(
        f"round(({n} - m_{n}) / s_{n}, 6) AS {n}" for n in names
    )
    w0_sel = "0.0 AS b, " + ", ".join(f"0.0 AS w_{n}" for n in names)
    marg = "b + " + " + ".join(f"w_{n} * {n}" for n in names)
    ctes = [
        f"""raw AS MATERIALIZED (
      SELECT CAST({label_sql} AS DOUBLE) AS y, {feat_sel} FROM {table})""",
        f"st AS MATERIALIZED (SELECT {st_sel} FROM raw)",
        f"""z AS MATERIALIZED (
      SELECT y, {z_sel} FROM raw CROSS JOIN st)""",
        f"w0 AS MATERIALIZED (SELECT {w0_sel})",
    ]
    prev = "w0"
    for t in range(1, iterations + 1):
        g_sel = ", ".join(
            [f"round(avg(r), 6) AS gb"]
            + [f"round(avg(r * {n}), 6) AS g_{n}" for n in names]
        )
        ctes.append(
            f"""g{t} AS MATERIALIZED (SELECT {g_sel} FROM (
      SELECT y, {', '.join(names)},
             1.0 / (1.0 + exp(-({marg}))) - y AS r
      FROM z CROSS JOIN {prev}) p)"""
        )
        w_sel = ", ".join(
            [f"round(b - {lr!r} * gb, 6) AS b"]
            + [f"round(w_{n} - {lr!r} * g_{n}, 6) AS w_{n}" for n in names]
        )
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT {w_sel} FROM {prev} CROSS JOIN g{t})"
        )
        prev = f"w{t}"
    return ctes, prev, marg, names


def logreg_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    iterations: int = 8,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``logreg_train`` — unrolled-CTE gradient
    descent with rounding at the identical points (standardized
    features, per-round gradients and weights, final margin)."""
    ctes, prev, marg, names = _logreg_oracle_parts(
        table, label_sql, features_sql, iterations, lr
    )
    ctes.append(
        f"""acc AS (SELECT round(avg(CASE WHEN
      (round({marg}, 6) >= 0) = (y = 1.0) THEN 1.0 ELSE 0.0 END), 6)
      AS a FROM z CROSS JOIN {prev})"""
    )
    unions = "\n    UNION ALL ".join(
        [f"SELECT 'bias' AS feature, b AS weight, acc.a AS train_accuracy "
         f"FROM {prev} CROSS JOIN acc"]
        + [
            f"SELECT '{n}', w_{n}, acc.a FROM {prev} CROSS JOIN acc"
            for n in names
        ]
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + unions


def _tree_gini(cl, pl, ct, pt):
    """Weighted two-child Gini impurity of a candidate split, rounded to
    12 dp for an engine-stable argmin key. Inputs are integer counts
    (left count/positives, node total count/positives) so both engines
    evaluate the identical double expression on identical operands:
    gini(S) = 1 − p₁² − p₀², and |S|·gini(S) = 2·pos·(cnt−pos)/cnt."""
    cr, pr = ct - cl, pt - pl
    return F.round(
        (F.lit(2.0) * pl * (cl - pl) / cl + F.lit(2.0) * pr * (cr - pr) / cr)
        / ct,
        12,
    )


def _pyround(x, d: int):
    """HALF_UP decimal rounding of a double, matching Spark's
    ``round(col, d)`` (BigDecimal.valueOf(double) → setScale(d,
    HALF_UP)): quantize the shortest round-trip decimal representation.
    Python's ``repr`` and Java's ``Double.toString`` both emit a
    decimal that rounds back to the exact double, so the quantized
    value agrees on every non-boundary input (and the oracle-parity
    suite pins the tree family at three scale factors)."""
    if x is None:
        return None
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP
        )
    )


def _py_gini(cl: int, pl: int, ct: int, pt: int) -> float:
    """Driver-side twin of ``_tree_gini`` over the collected histogram:
    the identical double expression on identical integer operands,
    rounded 12 dp by ``_pyround``."""
    cr, pr = ct - cl, pt - pl
    return _pyround(
        (2.0 * pl * (cl - pl) / cl + 2.0 * pr * (cr - pr) / cr) / ct, 12
    )


def _tree_route_predict(names_t: list[str], bins: int, pym: dict) -> Column:
    """Route a null-guarded feature row to its leaf's predict as ONE
    literal CASE expression over the driver-side model payload (r14 —
    VERDICT r13 #2: the per-level broadcast-join replay chains executed
    lazily at the sink, so a 5-tree forest scanned the test fold
    through five join chains). Arithmetic is the holdout routing's own,
    on identical literal operands: per feature the train-stats bin
    ``when(w = 0, 0).otherwise(least(bins-1, greatest(0,
    floor((x - mn)/w))))``, per level the winner map
    ``node -> 2·node + (bin_f <= b ? 0 : 1)`` with no-winner nodes
    staying put, then the leaf predict map. Rows always land on a leaf
    (levels reassign exactly the split nodes; every terminal node is a
    leaf row by construction)."""
    bincol = {}
    for n in names_t:
        w, m = pym["wd"][n], pym["mn"][n]
        bincol[n] = (
            F.when(_dlit(w) == F.lit(0.0), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col(n).cast("double") - _dlit(m)) / _dlit(w)
                        ).cast("int"),
                    ),
                )
            )
            .cast("int")
        )
    node: Column = F.lit(1).cast("bigint")
    for lvl in pym["levels"]:
        upd = None
        for nd, (f, b) in sorted(lvl.items()):
            child = (
                F.lit(nd * 2)
                + F.when(bincol[f] <= F.lit(b), F.lit(0)).otherwise(F.lit(1))
            ).cast("bigint")
            cond = node == F.lit(nd)
            upd = F.when(cond, child) if upd is None else upd.when(
                cond, child
            )
        if upd is not None:
            node = upd.otherwise(node)
    pred = None
    for nd, pv in sorted(pym["leaves"].items()):
        cond = node == F.lit(nd)
        pred = (
            F.when(cond, F.lit(pv)) if pred is None
            else pred.when(cond, F.lit(pv))
        )
    if pred is None:  # degenerate: no rows trained — no leaves
        pred = F.lit(None)
    return pred.cast("long")


def _decision_tree_build(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    bins: int = 16,
    depth: int = 2,
    keep_assigned: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame, list[DataFrame], dict]:
    """Shared trainer behind ``decision_tree_train`` (tree frame) and
    ``decision_tree_confusion`` (tree frame + final row→node
    assignments). Trains a depth-bounded binary tree by HISTOGRAM split
    finding — the distributed-GBDT discipline (LightGBM/XGBoost `hist`:
    equi-width feature histograms, one data pass per tree level, all
    split arithmetic over the model-sized histogram). Like the other
    in-engine trainers (kmeans/pca/logreg), the whole computation is a
    deterministic dataflow an ANSI-SQL oracle replicates level by level.

    ``label`` must evaluate to 0/1; ``features`` is an ordered list of
    (name, expression). Rows with a null label or any null feature are
    dropped. Per feature, ``bins`` equi-width bins over [min, max]
    (constant features land in bin 0 and can never split). Per level:

    1. ONE pass over the binned data — per (node, feature, bin) counts
       and positive counts (map-side combined; the shuffle carries at
       most nodes·F·bins rows);
    2. candidate splits "bin ≤ b" from prefix sums over the histogram
       (a window over the model-sized frame), scored by weighted Gini
       rounded to 12 dp, both children non-empty;
    3. per-node argmin with a total deterministic order
       (gini, feature name, bin) — row_number over nodes·F·bins rows;
    4. node reassignment: winners broadcast back, rows move to child
       2·node (left) or 2·node+1 (right); nodes with no valid split
       become leaves and their rows stop moving.

    Returns one row per tree node: (node, depth, kind 'split'|'leaf',
    feature, threshold, n, pos, pos_rate, predict) — thresholds are the
    real-valued bin boundary min + (b+1)·width rounded to 6 dp; predict
    is the majority label (ties → 1).

    Scale shape: ``depth`` scans of the checkpointed binned frame
    (each a whole-stage-codegen projection + partial-aggregated count),
    everything else arithmetic over histogram frames whose size is
    bounded by nodes·F·bins, independent of n. Exactly how distributed
    histogram-based tree learners place the work: data-scale passes
    build histograms, split search never touches rows."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    names = [n for n, _ in features]
    spark = df.sparkSession
    raw = (
        ensure_parallelism(df)
        .select(
            label.cast("bigint").alias("__y"),
            *[expr.cast("double").alias(n) for n, expr in features],
        )
        .na.drop(subset=["__y", *names])
    )
    # r13: collect the 2F-double min/max row (the identical aggregate)
    # and feed mins/widths back as literals — the binned frame then
    # plans flat instead of through a crossJoin(broadcast(st)), and the
    # split search below runs on the driver over the collected
    # model-sized histogram instead of a per-level window+join+broadcast
    # plan chain whose Catalyst cost dominated wall-clock at every
    # data scale (OPTIMIZATION_r13.md: execution at sf0.1 was <1 s
    # while query construction planned for 10-20 s on the rf family).
    strow = raw.agg(
        *[F.min(n).alias(f"__mn_{n}") for n in names],
        *[F.max(n).alias(f"__mx_{n}") for n in names],
    ).select(
        "*",
        *[
            ((F.col(f"__mx_{n}") - F.col(f"__mn_{n}")) / F.lit(float(bins)))
            .alias(f"__w_{n}")
            for n in names
        ],
    ).first()
    st = _row1(spark, {k: strow[k] for k in strow.asDict()})
    mn = {n: strow[f"__mn_{n}"] for n in names}
    wd = {n: strow[f"__w_{n}"] for n in names}
    # persist, not bare localCheckpoint (the round_materialize finding:
    # consumers of a lazy localCheckpoint recompute its lineage) — each
    # level's histogram pass must read the binned blocks, not re-scan
    # the source
    binned = (
        raw.select(
            "__y",
            *[
                F.when(_dlit(wd[n]) == F.lit(0.0), F.lit(0))
                .otherwise(
                    F.least(
                        F.lit(bins - 1),
                        F.greatest(
                            F.lit(0),
                            F.floor(
                                (F.col(n) - _dlit(mn[n])) / _dlit(wd[n])
                            ).cast("int"),
                        ),
                    )
                )
                .cast("int")
                .alias(f"__b_{n}")
                for n in names
            ],
        )
        .withColumn("__node", F.lit(1).cast("bigint"))
        .persist()
    )
    stack_expr = "stack({}, {})".format(
        len(names), ", ".join(f"'{n}', __b_{n}" for n in names)
    )
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    wsel_schema = StructType([
        StructField("__wn", LongType()),
        StructField("__f", StringType()),
        StructField("__sb", IntegerType()),
    ])
    assigned = binned
    frontier: dict | None = None  # node -> (ct, pt) entering the level
    tree_rows: list[tuple] = []
    winners_levels: list[DataFrame] = []  # (__wn, __f, __sb) per level
    levels_py: list[dict] = []  # node -> (feature, bin) per level (r14)
    for _lvl in range(depth):
        # ONE data pass per level (the distributed-GBDT `hist`
        # contract, unchanged); the nodes·F·bins histogram is
        # model-sized by construction, so collecting it is the same
        # driver traffic the old winners/tot plans shipped via
        # broadcasts — and the whole split search is exact integer
        # prefix-sum arithmetic plus the 12-dp gini double expression
        # evaluated on identical operands (_py_gini).
        hrows = (
            assigned.select(
                "__node", "__y", F.expr(stack_expr).alias("__f", "__bin")
            )
            .groupBy("__node", "__f", "__bin")
            .agg(F.count("*").alias("__c"), F.sum("__y").alias("__p"))
            .collect()
        )
        hist: dict = {}
        for r in hrows:
            hist.setdefault((r["__node"], r["__f"]), []).append(
                (r["__bin"], r["__c"], r["__p"])
            )
        tot = {
            node: (
                sum(c for _b, c, _p in cells),
                sum(p for _b, _c, p in cells),
            )
            for (node, f), cells in hist.items()
            if f == names[0]
        }
        if frontier is None:
            frontier = dict(tot)
        winners: dict = {}  # node -> (gini, f, bin, cl, pl, ct, pt)
        for (node, f), cells in sorted(hist.items()):
            ct, pt = tot[node]
            cl = pl = 0
            for b, c, p in sorted(cells):
                cl += c
                pl += p
                if not (0 < cl < ct):
                    continue
                g = _py_gini(cl, pl, ct, pt)
                if node not in winners or (g, f, b) < winners[node][:3]:
                    winners[node] = (g, f, b, cl, pl, ct, pt)
        for node, (_g, f, b, _cl, _pl, ct, pt) in sorted(winners.items()):
            # raw threshold — the 6-dp round stays a Spark expression in
            # the tree select below
            tree_rows.append(
                (node, "split", f, mn[f] + (b + 1) * wd[f], ct, pt)
            )
        for node, (ct, pt) in sorted(frontier.items()):
            if node not in winners:
                tree_rows.append((node, "leaf", None, None, ct, pt))
        frontier = {}
        for node, (_g, _f, _b, cl, pl, ct, pt) in winners.items():
            frontier[node * 2] = (cl, pl)
            frontier[node * 2 + 1] = (ct - cl, pt - pl)
        wsel = spark.createDataFrame(
            [
                (node, f, b)
                for node, (_g, f, b, *_r) in sorted(winners.items())
            ],
            wsel_schema,
        )
        winners_levels.append(wsel)
        levels_py.append(
            {node: (f, b) for node, (_g, f, b, *_r) in winners.items()}
        )
        upd = None
        for node, (_g, f, b, *_r) in sorted(winners.items()):
            child = F.lit(node * 2) + F.when(
                F.col(f"__b_{f}") <= F.lit(b), F.lit(0)
            ).otherwise(F.lit(1))
            cond = F.col("__node") == F.lit(node)
            upd = F.when(cond, child) if upd is None else upd.when(
                cond, child
            )
        if upd is not None:
            assigned = assigned.select(
                "__y",
                *[f"__b_{n}" for n in names],
                upd.otherwise(F.col("__node")).cast("bigint")
                .alias("__node"),
            )
    for node, (ct, pt) in sorted(frontier.items()):
        tree_rows.append((node, "leaf", None, None, ct, pt))
    tree_schema = StructType([
        StructField("node", LongType()),
        StructField("kind", StringType()),
        StructField("feature", StringType()),
        StructField("__thr", DoubleType()),
        StructField("n", LongType()),
        StructField("pos", LongType()),
    ])
    tree = spark.createDataFrame(tree_rows, tree_schema).select(
        "node",
        F.floor(F.log2("node")).cast("long").alias("depth"),
        "kind",
        "feature",
        F.round(F.col("__thr"), 6).alias("threshold"),
        "n",
        "pos",
        F.round(F.col("pos") / F.col("n"), 6).alias("pos_rate"),
        F.when(F.col("pos") * 2 >= F.col("n"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("predict"),
    )
    # Driver-side model payload (r14 — VERDICT r13 #2): everything a
    # caller needs to route unseen rows as ONE literal CASE expression
    # instead of replaying the per-level broadcast-join chain. Exact
    # integer arithmetic throughout: predict = (2·pos >= n) on the
    # collected counts is the tree frame's own Spark expression on
    # identical operands.
    pym = {
        "mn": mn,
        "wd": wd,
        "levels": levels_py,
        "leaves": {
            node: (1 if 2 * pt >= ct else 0)
            for node, kind, _f, _thr, ct, pt in tree_rows
            if kind == "leaf"
        },
        "n_nodes": {node: ct for node, _k, _f, _t, ct, _p in tree_rows},
    }
    if not keep_assigned:
        # the model is driver-side literals now; nothing downstream
        # reads the binned cache (ADVICE r13: threaded tree builds left
        # every tree's binned frame resident until the next query)
        binned.unpersist()
    return tree, assigned, st, winners_levels, pym


def _decision_tree_build_multi(
    prep: DataFrame,
    label_col: str,
    specs: list[tuple[Column, list[str]]],
    bins: int,
    depth: int,
) -> list[tuple[list[tuple], dict]]:
    """Fused K-tree histogram trainer (r14 — VERDICT r13 #3, the
    _logreg_fit_multi discipline for trees): train every tree of a
    CV/forest family in ONE scan per level. ``specs`` is one
    (row_condition, feature_names) pair per tree over the shared
    persisted ``prep`` frame.

    Equivalence to per-tree ``_decision_tree_build`` runs: the per-tree
    min/max stats are conditional aggregates (min/max are
    order-independent, so conditional ≡ filtered exactly); bin widths
    are the identical Spark division over the identical collected
    doubles; each level's (tree, node, feature, bin) histogram is an
    integer count/sum — the inline(struct-array) fan-out guarded by
    ``when(cond ∧ non-null, node)`` emits exactly the rows the
    per-tree na.drop+filter pipeline aggregated, and integer sums are
    order-free — so the collected histograms, and therefore the
    driver-side gini split search and every tree, are IDENTICAL.
    Per level the shuffle carries Σ_t nodes·F_t·bins rows (model-sized)
    and the job count drops K-fold at every data scale.

    Returns per tree (tree_rows, pym) — the literal node rows
    (node, kind, feature, raw_threshold, n, pos) and the routing
    payload ``_tree_route_predict`` consumes."""
    kk = len(specs)
    y = F.col(label_col).cast("bigint")
    xcol = {}
    valid = []
    for cond, names_t in specs:
        for n in names_t:
            if n not in xcol:
                xcol[n] = F.col(n).cast("double")
        v = y.isNotNull()
        for n in names_t:
            v = v & xcol[n].isNotNull()
        valid.append(cond & v)
    # per-tree min/max in ONE scan, widths in the same Spark select
    stat_exprs = []
    for i, (cond, names_t) in enumerate(specs):
        for n in names_t:
            stat_exprs.append(
                F.min(F.when(valid[i], xcol[n])).alias(f"__mn_{i}_{n}")
            )
            stat_exprs.append(
                F.max(F.when(valid[i], xcol[n])).alias(f"__mx_{i}_{n}")
            )
    width_exprs = [
        (
            (F.col(f"__mx_{i}_{n}") - F.col(f"__mn_{i}_{n}"))
            / F.lit(float(bins))
        ).alias(f"__w_{i}_{n}")
        for i, (_c, names_t) in enumerate(specs)
        for n in names_t
    ]
    strow = prep.agg(*stat_exprs).select("*", *width_exprs).first()
    mn = [
        {n: strow[f"__mn_{i}_{n}"] for n in names_t}
        for i, (_c, names_t) in enumerate(specs)
    ]
    wd = [
        {n: strow[f"__w_{i}_{n}"] for n in names_t}
        for i, (_c, names_t) in enumerate(specs)
    ]
    bincol = [
        {
            n: F.when(_dlit(wd[i][n]) == F.lit(0.0), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (xcol[n] - _dlit(mn[i][n])) / _dlit(wd[i][n])
                        ).cast("int"),
                    ),
                )
            )
            .cast("int")
            for n in names_t
        }
        for i, (_c, names_t) in enumerate(specs)
    ]
    node_expr: list[Column] = [
        F.lit(1).cast("bigint") for _ in range(kk)
    ]
    frontier: list[dict | None] = [None] * kk
    tree_rows: list[list[tuple]] = [[] for _ in range(kk)]
    levels_py: list[list[dict]] = [[] for _ in range(kk)]
    for _lvl in range(depth):
        entries = []
        for i, (_c, names_t) in enumerate(specs):
            for n in names_t:
                entries.append(
                    F.struct(
                        F.lit(i).alias("__i"),
                        F.lit(n).alias("__f"),
                        F.when(valid[i], node_expr[i]).alias("__node"),
                        bincol[i][n].alias("__bin"),
                        y.alias("__y"),
                    )
                )
        hrows = (
            prep.select(F.inline(F.array(*entries)))
            .filter(F.col("__node").isNotNull())
            .groupBy("__i", "__f", "__node", "__bin")
            .agg(F.count("*").alias("__c"), F.sum("__y").alias("__p"))
            .collect()
        )
        hists: list[dict] = [{} for _ in range(kk)]
        for r in hrows:
            hists[r["__i"]].setdefault((r["__node"], r["__f"]), []).append(
                (r["__bin"], r["__c"], r["__p"])
            )
        for i, (_c, names_t) in enumerate(specs):
            hist = hists[i]
            tot = {
                node: (
                    sum(c for _b, c, _p in cells),
                    sum(p for _b, _c, p in cells),
                )
                for (node, f), cells in hist.items()
                if f == names_t[0]
            }
            if frontier[i] is None:
                frontier[i] = dict(tot)
            winners: dict = {}
            for (node, f), cells in sorted(hist.items()):
                ct, pt = tot[node]
                cl = pl = 0
                for b, c, p in sorted(cells):
                    cl += c
                    pl += p
                    if not (0 < cl < ct):
                        continue
                    g = _py_gini(cl, pl, ct, pt)
                    if node not in winners or (g, f, b) < winners[node][:3]:
                        winners[node] = (g, f, b, cl, pl, ct, pt)
            for node, (_g, f, b, _cl, _pl, ct, pt) in sorted(
                winners.items()
            ):
                tree_rows[i].append(
                    (node, "split", f, mn[i][f] + (b + 1) * wd[i][f],
                     ct, pt)
                )
            for node, (ct, pt) in sorted(frontier[i].items()):
                if node not in winners:
                    tree_rows[i].append((node, "leaf", None, None, ct, pt))
            levels_py[i].append(
                {node: (f, b) for node, (_g, f, b, *_r) in winners.items()}
            )
            nf: dict = {}
            for node, (_g, _f, _b, cl, pl, ct, pt) in winners.items():
                nf[node * 2] = (cl, pl)
                nf[node * 2 + 1] = (ct - cl, pt - pl)
            frontier[i] = nf
            upd = None
            for node, (_g, f, b, *_r) in sorted(winners.items()):
                child = F.lit(node * 2) + F.when(
                    bincol[i][f] <= F.lit(b), F.lit(0)
                ).otherwise(F.lit(1))
                cond_n = node_expr[i] == F.lit(node)
                upd = (
                    F.when(cond_n, child) if upd is None
                    else upd.when(cond_n, child)
                )
            if upd is not None:
                node_expr[i] = upd.otherwise(node_expr[i]).cast("bigint")
    out: list[tuple[list[tuple], dict]] = []
    for i, (_c, names_t) in enumerate(specs):
        rows = list(tree_rows[i])
        for node, (ct, pt) in sorted((frontier[i] or {}).items()):
            rows.append((node, "leaf", None, None, ct, pt))
        pym = {
            "mn": mn[i],
            "wd": wd[i],
            "levels": levels_py[i],
            "leaves": {
                node: (1 if 2 * pt >= ct else 0)
                for node, kind, _f, _t, ct, pt in rows
                if kind == "leaf"
            },
            "n_nodes": {node: ct for node, _k, _f, _t, ct, _p in rows},
        }
        out.append((rows, pym))
    return out


def _tree_frame_from_rows(spark, rows: list[tuple]) -> DataFrame:
    """The tree MODEL frame from literal node rows — the exact select
    ``_decision_tree_build`` ends with (same schema, same Spark round
    and predict expressions over the same collected integers)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    tree_schema = StructType([
        StructField("node", LongType()),
        StructField("kind", StringType()),
        StructField("feature", StringType()),
        StructField("__thr", DoubleType()),
        StructField("n", LongType()),
        StructField("pos", LongType()),
    ])
    return spark.createDataFrame(rows, tree_schema).select(
        "node",
        F.floor(F.log2("node")).cast("long").alias("depth"),
        "kind",
        "feature",
        F.round(F.col("__thr"), 6).alias("threshold"),
        "n",
        "pos",
        F.round(F.col("pos") / F.col("n"), 6).alias("pos_rate"),
        F.when(F.col("pos") * 2 >= F.col("n"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("predict"),
    )


def decision_tree_train(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    bins: int = 16,
    depth: int = 2,
) -> DataFrame:
    """Train a depth-bounded binary decision tree by histogram split
    finding; returns the tree frame (node, depth, kind, feature,
    threshold, n, pos, pos_rate, predict). Full algorithm and scale
    notes: ``_decision_tree_build``."""
    return _decision_tree_build(
        df, label, features, bins, depth, keep_assigned=False
    )[0]


def decision_tree_confusion(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    bins: int = 16,
    depth: int = 2,
) -> DataFrame:
    """Train the tree AND score the training rows: confusion matrix
    (actual, predicted, cnt) — the train→apply contract beside
    ``decision_tree_train`` (logreg carries train_accuracy the same
    way). Scoring costs ONE broadcast hash join: training already left
    every row at its final tree node (``_decision_tree_build``'s
    assignment frame), and the ≤ 2^(depth+1)-row (node → predict) map
    broadcasts into it; no re-walk of the tree, no second data shuffle."""
    tree, assigned, _st, _wl, _pym = _decision_tree_build(
        df, label, features, bins, depth
    )
    pred = tree.select("node", "predict")
    return (
        assigned.join(
            F.broadcast(pred), assigned["__node"] == pred["node"]
        )
        .groupBy(
            F.col("__y").alias("actual"),
            F.col("predict").alias("predicted"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("actual").cast("long").alias("actual"),
            F.col("predicted").cast("long").alias("predicted"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def _tree_oracle_parts(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    bins: int = 16,
    depth: int = 2,
) -> tuple[list[str], str]:
    """Shared CTE assembly behind ``decision_tree_oracle_sql`` and
    ``decision_tree_confusion_oracle_sql``: the identical level-by-level
    dataflow as CTEs — equi-width binning from the same min/width
    doubles, per-level histogram + prefix-sum candidates, 12-dp-rounded
    Gini argmin with the same (gini, feature, bin) total order,
    winner-join node reassignment. Returns (ctes, tree_body) where
    tree_body unions the internal/leaf rows (node, kind, feature,
    threshold, n, pos); the final assignment CTE is ``a{depth}``."""
    names = [n for n, _ in features_sql]
    first = names[0]
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql
    )
    null_guard = " AND ".join(
        [f"({label_sql}) IS NOT NULL"]
        + [f"({e}) IS NOT NULL" for _, e in features_sql]
    )
    st_sel = ", ".join(
        f"min({n}) AS mn_{n}, max({n}) AS mx_{n}" for n in names
    )
    w_sel = ", ".join(
        f"(mx_{n} - mn_{n}) / {float(bins)!r} AS w_{n}" for n in names
    )
    bin_sel = ", ".join(
        f"CASE WHEN w_{n} = 0 THEN 0 ELSE least({bins - 1}, greatest(0, "
        f"CAST(floor(({n} - mn_{n}) / w_{n}) AS INT))) END AS b_{n}"
        for n in names
    )
    fstats = " UNION ALL ".join(
        f"SELECT '{n}' AS feature, mn_{n} AS mn, w_{n} AS w FROM stw"
        for n in names
    )
    bcols = ", ".join(f"b_{n}" for n in names)
    unpivot = "\n      UNION ALL ".join(
        f"SELECT node, y, '{n}' AS f, b_{n} AS bin FROM a{{lvl}}"
        for n in names
    )
    case_bin = (
        "CASE w.f "
        + " ".join(f"WHEN '{n}' THEN a.b_{n}" for n in names)
        + " END"
    )
    ctes = [
        f"""raw AS MATERIALIZED (
      SELECT CAST({label_sql} AS BIGINT) AS y, {feat_sel}
      FROM {table} WHERE {null_guard})""",
        f"st AS MATERIALIZED (SELECT {st_sel} FROM raw)",
        f"stw AS MATERIALIZED (SELECT *, {w_sel} FROM st)",
        f"""a0 AS MATERIALIZED (
      SELECT y, {bin_sel}, CAST(1 AS BIGINT) AS node
      FROM raw CROSS JOIN stw)""",
        f"fstats AS MATERIALIZED ({fstats})",
    ]
    internal_sel = []
    leaf_sel = []
    for lvl in range(depth):
        up = unpivot.format(lvl=lvl)
        ctes.append(
            f"""h{lvl} AS MATERIALIZED (
      SELECT node, f, bin, count(*) AS c, sum(y) AS p FROM (
      {up}) u GROUP BY node, f, bin)"""
        )
        ctes.append(
            f"""t{lvl} AS MATERIALIZED (
      SELECT node, sum(c) AS ct, sum(p) AS pt
      FROM h{lvl} WHERE f = '{first}' GROUP BY node)"""
        )
        ctes.append(
            f"""s{lvl} AS MATERIALIZED (
      SELECT * FROM (
        SELECT h.node, h.f, h.bin,
               sum(h.c) OVER (PARTITION BY h.node, h.f
                              ORDER BY h.bin) AS cl,
               sum(h.p) OVER (PARTITION BY h.node, h.f
                              ORDER BY h.bin) AS pl,
               t.ct, t.pt
        FROM h{lvl} h JOIN t{lvl} t ON t.node = h.node) c
      WHERE cl > 0 AND cl < ct)"""
        )
        ctes.append(
            f"""w{lvl} AS MATERIALIZED (
      SELECT node, f, bin, cl, pl, ct, pt FROM (
        SELECT *, row_number() OVER (PARTITION BY node ORDER BY
          round((2.0*pl*(cl-pl)/cl + 2.0*(pt-pl)*((ct-cl)-(pt-pl))/(ct-cl))
                / ct, 12), f, bin) AS rn
        FROM s{lvl}) r WHERE rn = 1)"""
        )
        ctes.append(
            f"""a{lvl + 1} AS MATERIALIZED (
      SELECT a.y, {bcols},
             CASE WHEN w.node IS NULL THEN a.node
                  ELSE a.node * 2 + CASE WHEN {case_bin} <= w.bin
                                         THEN 0 ELSE 1 END
             END AS node
      FROM a{lvl} a LEFT JOIN w{lvl} w ON w.node = a.node)"""
        )
        frontier = (
            f"t0"
            if lvl == 0
            else f"fr{lvl}"
        )
        if lvl > 0:
            ctes.append(
                f"""fr{lvl} AS MATERIALIZED (
      SELECT node * 2 AS node, cl AS ct, pl AS pt FROM w{lvl - 1}
      UNION ALL
      SELECT node * 2 + 1, ct - cl, pt - pl FROM w{lvl - 1})"""
            )
        internal_sel.append(
            f"""SELECT w.node, 'split' AS kind, w.f AS feature,
             round(fs.mn + (w.bin + 1) * fs.w, 6) AS threshold,
             w.ct AS n, w.pt AS pos
      FROM w{lvl} w JOIN fstats fs ON fs.feature = w.f"""
        )
        leaf_sel.append(
            f"""SELECT fr.node, 'leaf', CAST(NULL AS VARCHAR),
             CAST(NULL AS DOUBLE), fr.ct, fr.pt
      FROM {frontier} fr LEFT JOIN w{lvl} w ON w.node = fr.node
      WHERE w.node IS NULL"""
        )
    ctes.append(
        f"""fr{depth} AS MATERIALIZED (
      SELECT node * 2 AS node, cl AS ct, pl AS pt FROM w{depth - 1}
      UNION ALL
      SELECT node * 2 + 1, ct - cl, pt - pl FROM w{depth - 1})"""
    )
    leaf_sel.append(
        f"SELECT node, 'leaf', CAST(NULL AS VARCHAR), "
        f"CAST(NULL AS DOUBLE), ct, pt FROM fr{depth}"
    )
    body = "\n      UNION ALL ".join(internal_sel + leaf_sel)
    return ctes, body


def decision_tree_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    bins: int = 16,
    depth: int = 2,
) -> str:
    """DuckDB replica of ``decision_tree_train`` (see
    ``_tree_oracle_parts`` for the dataflow)."""
    ctes, body = _tree_oracle_parts(table, label_sql, features_sql,
                                    bins, depth)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(node AS BIGINT) AS node,
           CAST(floor(log2(node)) AS BIGINT) AS depth,
           kind, feature, threshold,
           CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
           round(pos / n, 6) AS pos_rate,
           CAST(CASE WHEN pos * 2 >= n THEN 1 ELSE 0 END AS BIGINT)
             AS predict
    FROM ({body}) tree"""
    )


def decision_tree_confusion_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    bins: int = 16,
    depth: int = 2,
) -> str:
    """DuckDB replica of ``decision_tree_confusion`` — the same tree
    CTEs, then the final assignment CTE joined to the per-leaf majority
    label exactly as the engine scores it."""
    ctes, body = _tree_oracle_parts(table, label_sql, features_sql,
                                    bins, depth)
    ctes.append(
        f"""tree AS MATERIALIZED (
      SELECT node,
             CAST(CASE WHEN pos * 2 >= n THEN 1 ELSE 0 END AS BIGINT)
               AS predict
      FROM ({body}) t)"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(a.y AS BIGINT) AS actual, t.predict AS predicted,
           CAST(count(*) AS BIGINT) AS cnt
    FROM a{depth} a JOIN tree t ON t.node = a.node
    GROUP BY a.y, t.predict"""
    )


def _boost_fit(
    df: DataFrame,
    target: Column,
    features: list[tuple[str, Column]],
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
):
    """Gradient-boosted regression STUMPS trained in-engine — Friedman's
    LS_Boost with depth-1 histogram trees, the additive-model companion
    to ``decision_tree_train`` (classification tree) and ``logreg_train``
    (linear model). Fit F₀ = mean(y); each round fits one stump to the
    residuals by the same equi-width-histogram split search and adds
    ν·leaf-mean to the prediction.

    Determinism/oracle contract (the logreg discipline): per-ROW
    residual updates are exact row-local double arithmetic (y, the 6-dp
    base and the 6-dp leaf values — no cross-row accumulation, so both
    engines hold bit-identical residuals); every cross-row SUM is
    rounded to 6 dp before use (sums of ~n doubles differ between
    engines only in the last ulps, absorbed at 6 dp); the split gain
    sl²/cl + sr²/cr over the ROUNDED sums is rounded to 9 dp and
    argmax'd under the total (gain DESC, feature, bin) order. A round
    with no valid split (constant features) adds nothing and emits no
    stump row — the left-join update keeps residuals intact.

    Returns one row per model term: round 0 is the base prediction
    (feature 'base', both values F₀); round k the stump (feature,
    threshold, left_value, right_value) with values already scaled by
    ``lr``; every row carries the final train_rmse.

    Scale shape: the binned frame is built once (one min/max pass + one
    projection) and checkpointed; each round is ONE codegen scan into a
    map-side-combined F·bins-cell histogram plus a broadcast 1-row
    stump joined back — cost is ``rounds`` linear passes, the
    distributed-GBDT `hist` contract."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    names = [n for n, _ in features]
    spark = df.sparkSession
    raw = (
        ensure_parallelism(df)
        .select(
            target.cast("double").alias("__y"),
            *[expr.cast("double").alias(n) for n, expr in features],
        )
        .na.drop(subset=["__y", *names])
        .persist()
    )
    # r13 (the _decision_tree_build shape): min/max/width and the base
    # prediction collect as scalars; each round is ONE histogram scan
    # of the cached binned frame whose F·bins cells collect to the
    # driver, where the split search runs as exact integer/rounded-6dp
    # arithmetic — no per-round window/broadcast plan chains.
    strow = raw.agg(
        *[F.min(n).alias(f"__mn_{n}") for n in names],
        *[F.max(n).alias(f"__mx_{n}") for n in names],
    ).select(
        "*",
        *[
            ((F.col(f"__mx_{n}") - F.col(f"__mn_{n}")) / F.lit(float(bins)))
            .alias(f"__w_{n}")
            for n in names
        ],
    ).first()
    st = _row1(spark, {k: strow[k] for k in strow.asDict()})
    mn = {n: strow[f"__mn_{n}"] for n in names}
    wd = {n: strow[f"__w_{n}"] for n in names}
    binned = raw.select(
        "__y",
        *[
            F.when(_dlit(wd[n]) == F.lit(0.0), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col(n) - _dlit(mn[n])) / _dlit(wd[n])
                        ).cast("int"),
                    ),
                )
            )
            .cast("int")
            .alias(f"__b_{n}")
            for n in names
        ],
    )
    f0 = raw.agg(F.round(F.avg("__y"), 6).alias("__f0")).first()["__f0"]
    base = _row1(spark, {"__f0": f0})
    resid = binned.select(
        *[f"__b_{n}" for n in names],
        (F.col("__y") - _dlit(f0)).alias("__r"),
    )
    stack_expr = "stack({}, {})".format(
        len(names), ", ".join(f"'{n}', __b_{n}" for n in names)
    )
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    winner_schema = StructType([
        StructField("__f", StringType()),
        StructField("__bin", IntegerType()),
        StructField("__lv", DoubleType()),
        StructField("__rv", DoubleType()),
    ])
    stump_rows: list[tuple] = []
    winner_frames: list[DataFrame] = []
    winners: list[tuple | None] = []  # (f, b, lv, rv) per round (r14)
    for k in range(1, rounds + 1):
        hrows = (
            resid.select("__r", F.expr(stack_expr).alias("__f", "__bin"))
            .groupBy("__f", "__bin")
            .agg(F.count("*").alias("__c"), F.sum("__r").alias("__s"))
            .collect()
        )
        hist: dict = {}
        for r in hrows:
            hist.setdefault(r["__f"], []).append(
                (r["__bin"], r["__c"], r["__s"])
            )
        first = sorted(hist.get(names[0], []))
        ct = sum(c for _b, c, _s in first)
        srt = _pyround(sum(s for _b, _c, s in first), 6)
        best = None  # (-gain, f, bin, lv, rv)
        for f, cells in sorted(hist.items()):
            cl = 0
            sl_raw = 0.0
            for b, c, s in sorted(cells):
                cl += c
                sl_raw += s
                sl = _pyround(sl_raw, 6)
                if not (0 < cl < ct):
                    continue
                gain = _pyround(
                    sl * sl / cl
                    + (srt - sl) * (srt - sl) / (ct - cl),
                    9,
                )
                key = (-gain, f, b)
                if best is None or key < best[0]:
                    lv = _pyround(lr * sl / cl, 6)
                    rv = _pyround(lr * (srt - sl) / (ct - cl), 6)
                    best = (key, f, b, lv, rv)
        if best is not None:
            _k0, f, b, lv, rv = best
            winner_frames.append(
                spark.createDataFrame([(f, b, lv, rv)], winner_schema)
            )
            winners.append((f, b, lv, rv))
            stump_rows.append(
                (k, f, mn[f] + (b + 1) * wd[f], lv, rv)
            )
            resid = resid.select(
                *[f"__b_{n}" for n in names],
                (
                    F.col("__r")
                    - F.when(
                        F.col(f"__b_{f}") <= F.lit(b), _dlit(lv)
                    ).otherwise(_dlit(rv))
                ).alias("__r"),
            )
        else:
            # no valid split this round: no stump row, residuals intact
            winner_frames.append(
                spark.createDataFrame([], winner_schema)
            )
            winners.append(None)
    rmse = resid.agg(
        F.round(F.sqrt(F.avg(F.col("__r") * F.col("__r"))), 6)
        .alias("__rmse")
    )
    model_schema = StructType([
        StructField("round", LongType()),
        StructField("feature", StringType()),
        StructField("__thr", DoubleType()),
        StructField("left_value", DoubleType()),
        StructField("right_value", DoubleType()),
    ])
    out = spark.createDataFrame(
        [(0, "base", None, f0, f0)]
        + [(k, f, thr, lv, rv) for k, f, thr, lv, rv in stump_rows],
        model_schema,
    )
    model = out.crossJoin(F.broadcast(rmse)).select(
        "round", "feature",
        F.round(F.col("__thr"), 6).alias("threshold"),
        "left_value", "right_value",
        F.col("__rmse").alias("train_rmse"),
    )
    payload = {"mn": mn, "wd": wd, "f0": f0, "winners": winners}
    return model, st, base, winner_frames, names, payload


def boost_stumps_train(
    df: DataFrame,
    target: Column,
    features: list[tuple[str, Column]],
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
) -> DataFrame:
    """Train gradient-boosted regression stumps; returns the model
    frame (round, feature, threshold, left_value, right_value,
    train_rmse). Full algorithm and contracts: ``_boost_fit``."""
    return _boost_fit(df, target, features, rounds, bins, lr)[0]


def boost_stumps_oracle_sql(
    table: str,
    target_sql: str,
    features_sql: list[tuple[str, str]],
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``boost_stumps_train`` — the identical
    round-by-round dataflow as CTEs with sums rounded 6 dp, gain 9 dp,
    leaf values 6 dp at the same points."""
    names = [n for n, _ in features_sql]
    first = names[0]
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql
    )
    null_guard = " AND ".join(
        [f"({target_sql}) IS NOT NULL"]
        + [f"({e}) IS NOT NULL" for _, e in features_sql]
    )
    st_sel = ", ".join(
        f"min({n}) AS mn_{n}, max({n}) AS mx_{n}" for n in names
    )
    w_sel = ", ".join(
        f"(mx_{n} - mn_{n}) / {float(bins)!r} AS w_{n}" for n in names
    )
    bin_sel = ", ".join(
        f"CASE WHEN w_{n} = 0 THEN 0 ELSE least({bins - 1}, greatest(0, "
        f"CAST(floor(({n} - mn_{n}) / w_{n}) AS INT))) END AS b_{n}"
        for n in names
    )
    fstats = " UNION ALL ".join(
        f"SELECT '{n}' AS feature, mn_{n} AS mn, w_{n} AS w FROM stw"
        for n in names
    )
    bcols = ", ".join(f"b_{n}" for n in names)
    unpivot_tpl = "\n      UNION ALL ".join(
        f"SELECT r, '{n}' AS f, b_{n} AS bin FROM {{src}}" for n in names
    )
    case_bin = (
        "CASE s.f "
        + " ".join(f"WHEN '{n}' THEN r.b_{n}" for n in names)
        + " END"
    )
    ctes = [
        f"""raw AS MATERIALIZED (
      SELECT CAST({target_sql} AS DOUBLE) AS y, {feat_sel}
      FROM {table} WHERE {null_guard})""",
        f"st AS MATERIALIZED (SELECT {st_sel} FROM raw)",
        f"stw AS MATERIALIZED (SELECT *, {w_sel} FROM st)",
        "base AS MATERIALIZED (SELECT round(avg(y), 6) AS f0 FROM raw)",
        f"""r0 AS MATERIALIZED (
      SELECT {bin_sel}, y - f0 AS r
      FROM raw CROSS JOIN stw CROSS JOIN base)""",
        f"fstats AS MATERIALIZED ({fstats})",
    ]
    stump_sel = []
    for k in range(1, rounds + 1):
        prev = f"r{k - 1}"
        up = unpivot_tpl.format(src=prev)
        ctes.append(
            f"""h{k} AS MATERIALIZED (
      SELECT f, bin, count(*) AS c, sum(r) AS s FROM (
      {up}) u GROUP BY f, bin)"""
        )
        ctes.append(
            f"""t{k} AS MATERIALIZED (
      SELECT sum(c) AS ct, round(sum(s), 6) AS srt
      FROM h{k} WHERE f = '{first}')"""
        )
        ctes.append(
            f"""s{k} AS MATERIALIZED (
      SELECT f, bin,
             round({lr!r} * sl / cl, 6) AS lv,
             round({lr!r} * (srt - sl) / (ct - cl), 6) AS rv
      FROM (
        SELECT *, row_number() OVER (ORDER BY
          round(sl * sl / cl + (srt - sl) * (srt - sl) / (ct - cl), 9)
            DESC, f, bin) AS rn
        FROM (
          SELECT h.f, h.bin,
                 sum(h.c) OVER (PARTITION BY h.f ORDER BY h.bin) AS cl,
                 round(sum(h.s) OVER (PARTITION BY h.f ORDER BY h.bin),
                       6) AS sl,
                 t.ct, t.srt
          FROM h{k} h CROSS JOIN t{k} t) c
        WHERE cl > 0 AND cl < ct) v
      WHERE rn = 1)"""
        )
        ctes.append(
            f"""r{k} AS MATERIALIZED (
      SELECT {bcols},
             CASE WHEN s.f IS NULL THEN r.r
                  ELSE r.r - CASE WHEN {case_bin} <= s.bin
                                  THEN s.lv ELSE s.rv END
             END AS r
      FROM {prev} r LEFT JOIN s{k} s ON TRUE)"""
        )
        stump_sel.append(
            f"""SELECT CAST({k} AS BIGINT) AS round, s.f AS feature,
             round(fs.mn + (s.bin + 1) * fs.w, 6) AS threshold,
             s.lv AS left_value, s.rv AS right_value
      FROM s{k} s JOIN fstats fs ON fs.feature = s.f"""
        )
    ctes.append(
        f"""rmse AS (SELECT round(sqrt(avg(r * r)), 6) AS v
      FROM r{rounds})"""
    )
    body = "\n      UNION ALL ".join(
        [
            "SELECT CAST(0 AS BIGINT) AS round, 'base' AS feature, "
            "CAST(NULL AS DOUBLE) AS threshold, f0 AS left_value, "
            "f0 AS right_value FROM base"
        ]
        + stump_sel
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT m.round, m.feature, m.threshold, m.left_value, m.right_value,
           rmse.v AS train_rmse
    FROM ({body}) m CROSS JOIN rmse"""
    )


def logreg_calibration(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    iterations: int = 8,
    lr: float = 0.5,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for the trained logistic regression — the
    calibration contract beside accuracy (``logreg_train``) and the
    tree/boosting evals: bin the 6-dp-rounded predicted probability
    p = σ(margin) into ``n_bins`` equal-width bins and compare the
    bin's mean prediction to its observed positive rate. A
    well-calibrated classifier shows |mean_pred − frac_pos| ≈ 0 per
    bin; the gap column is what a release gate thresholds on before
    trusting the scores as sampling weights.

    Returns (bin, n, mean_pred, frac_pos, gap) for non-empty bins.

    Scale shape: the same fit as ``logreg_train`` (the shared GD loop),
    then ONE codegen scan computing p and its bin (floor arithmetic on
    the rounded p — both engines bin identically) into an
    ``n_bins``-cell partial-aggregated groupBy."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    z, w, names, margin, _st = _logreg_fit(df, label, features,
                                            iterations, lr)
    p = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-margin())), 6
    )
    scored = z.crossJoin(F.broadcast(w)).select(
        "__y",
        p.alias("__p"),
    ).select(
        "__y", "__p",
        F.least(
            F.lit(n_bins - 1),
            F.floor(F.col("__p") * F.lit(float(n_bins))).cast("int"),
        ).alias("__bin"),
    )
    return (
        scored.groupBy("__bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("__p"), 6).alias("mean_pred"),
            F.round(F.avg("__y"), 6).alias("frac_pos"),
        )
        .select(
            F.col("__bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("n"),
            "mean_pred",
            "frac_pos",
            F.round(F.abs(F.col("mean_pred") - F.col("frac_pos")), 6)
            .alias("gap"),
        )
    )


def logreg_calibration_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    iterations: int = 8,
    lr: float = 0.5,
    n_bins: int = 10,
) -> str:
    """DuckDB replica of ``logreg_calibration`` — the shared GD CTEs,
    then the identical round-6 sigmoid, floor binning and per-bin
    aggregate."""
    ctes, prev, marg, names = _logreg_oracle_parts(
        table, label_sql, features_sql, iterations, lr
    )
    ctes.append(
        f"""cal AS (SELECT y,
      round(1.0 / (1.0 + exp(-({marg}))), 6) AS p
      FROM z CROSS JOIN {prev})"""
    )
    ctes.append(
        f"""binned AS (SELECT y, p,
      least({n_bins - 1}, CAST(floor(p * {float(n_bins)!r}) AS INT)) AS bin
      FROM cal)"""
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
           round(avg(p), 6) AS mean_pred,
           round(avg(y), 6) AS frac_pos,
           round(abs(round(avg(p), 6) - round(avg(y), 6)), 6) AS gap
    FROM binned GROUP BY bin"""
    )


def logreg_auc(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    iterations: int = 8,
    lr: float = 0.5,
) -> DataFrame:
    """Exact ROC-AUC of the trained classifier — the threshold-free
    ranking metric beside accuracy (``logreg_train``) and calibration
    (``logreg_calibration``): the tie-corrected Wilcoxon rank-sum

        AUC = Σ_s (neg_below(s)·pos(s) + pos(s)·neg(s)/2) / (P·N)

    computed over the HISTOGRAM of 6-dp predicted probabilities, not
    over rows. Because scores are rounded to 6 dp they live on a
    10⁶+1-point grid, so the histogram — and the one ordered cumulative
    window over it — is bounded regardless of corpus size; this is the
    standard scalable-AUC shape (bucket, then rank buckets). Ties get
    the exact average-rank credit of ½ per tied pair.

    Returns one row: (n_pos, n_neg, auc) with auc NULL when either
    class is empty (undefined, not a division error).

    Scale shape: the shared GD fit, one codegen scoring scan into a
    ≤10⁶-cell partial-aggregated histogram, one window over that
    bounded frame, one 1-row aggregate."""
    z, w, names, margin, _st = _logreg_fit(df, label, features,
                                            iterations, lr)
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin())), 6)
    scored = z.crossJoin(F.broadcast(w)).select(
        F.col("__y"), p.alias("__p")
    )
    return _auc_over_scores(scored).select(
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
        F.when(
            (F.col("__P") > 0) & (F.col("__N") > 0),
            F.round(F.col("__U") / (F.col("__P") * F.col("__N")), 6),
        ).alias("auc"),
    )


def _auc_over_scores(scored: DataFrame) -> DataFrame:
    """Tie-corrected Wilcoxon rank-sum over a (__y, __p) scored frame:
    histogram by the 6-dp score (bounded at 10⁶+1 cells), one ordered
    cumulative window over the histogram, return the 1-row
    (__P, __N, __U) frame. Shared by ``logreg_auc`` and
    ``logreg_holdout_eval``."""
    hist = scored.groupBy("__p").agg(
        F.sum("__y").cast("long").alias("__pos"),
        (F.count("*") - F.sum("__y")).cast("long").alias("__neg"),
    )
    win = (
        Window.orderBy("__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    contrib = hist.select(
        "__pos", "__neg",
        (F.sum("__neg").over(win) - F.col("__neg")).alias("__nb"),
    ).select(
        "__pos", "__neg",
        (
            F.col("__nb") * F.col("__pos")
            + F.col("__pos") * F.col("__neg") / F.lit(2.0)
        ).alias("__u"),
    )
    return contrib.agg(
        F.sum("__pos").alias("__P"),
        F.sum("__neg").alias("__N"),
        F.sum("__u").alias("__U"),
    )


def logreg_auc_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    iterations: int = 8,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``logreg_auc`` — shared GD CTEs, identical
    round-6 sigmoid, the same score histogram and cumulative rank-sum."""
    ctes, prev, marg, names = _logreg_oracle_parts(
        table, label_sql, features_sql, iterations, lr
    )
    ctes.append(
        f"""hist AS (SELECT round(1.0 / (1.0 + exp(-({marg}))), 6) AS p,
      CAST(sum(y) AS BIGINT) AS pos,
      CAST(count(*) - sum(y) AS BIGINT) AS neg
      FROM z CROSS JOIN {prev} GROUP BY 1)"""
    )
    ctes.append(
        """contrib AS (SELECT pos, neg,
      (sum(neg) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND
                      CURRENT ROW) - neg) * pos
      + pos * neg / 2.0 AS u
      FROM hist)"""
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + """
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CASE WHEN sum(pos) > 0 AND sum(neg) > 0
                THEN round(sum(u) / (sum(pos) * sum(neg)), 6)
                ELSE NULL END AS auc
    FROM contrib"""
    )


def logreg_pr_auc(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    iterations: int = 8,
    lr: float = 0.5,
) -> DataFrame:
    """Precision-Recall AUC of the trained classifier as AVERAGE
    PRECISION (the sklearn ``average_precision_score`` step-sum
    AP = Σ_k (R_k − R_{k−1})·P_k over descending score thresholds) —
    the metric that actually moves on CLASS-IMBALANCED corpora, where
    ROC-AUC is propped up by the huge true-negative pool (VERDICT r9
    #7). Computed over the same bounded histogram of 6-dp predicted
    probabilities as ``logreg_auc`` (bucket, then rank buckets): per
    distinct score, ΔR = bucket_pos/P and precision =
    cum_pos/(cum_pos+cum_neg) with ONE descending cumulative window
    over the ≤10⁶-cell frame; tied scores collapse into one bucket,
    matching sklearn's tie handling.

    Returns one row: (n_pos, n_neg, prevalence, pr_auc) — prevalence
    = P/(P+N) is the random-classifier AP, the baseline that makes
    PR-AUC legible (an AP of 0.3 is strong at 5% prevalence and
    broken at 50%); pr_auc NULL when there are no positives.

    Scale shape: the shared GD fit, one codegen scoring scan into the
    partial-aggregated histogram, one window over that bounded frame,
    one 1-row aggregate — identical cost to the ROC-AUC pass."""
    z, w, names, margin, _st = _logreg_fit(df, label, features,
                                           iterations, lr)
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin())), 6)
    scored = z.crossJoin(F.broadcast(w)).select(
        F.col("__y"), p.alias("__p")
    )
    return _pr_auc_over_scores(scored)


def _pr_auc_over_scores(scored: DataFrame) -> DataFrame:
    """Average precision over a (__y, __p) scored frame: histogram by
    the 6-dp score, one DESCENDING cumulative window, AP as the
    recall-weighted precision sum. Returns the 1-row
    (n_pos, n_neg, prevalence, pr_auc) frame."""
    hist = scored.groupBy("__p").agg(
        F.sum("__y").cast("long").alias("__pos"),
        (F.count("*") - F.sum("__y")).cast("long").alias("__neg"),
    )
    win = (
        Window.orderBy(F.col("__p").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "__pos", "__neg",
        F.sum("__pos").over(win).alias("__cp"),
        F.sum("__neg").over(win).alias("__cn"),
    )
    return cum.agg(
        F.sum("__pos").alias("__P"),
        F.sum("__neg").alias("__N"),
        F.sum(
            # double before the multiply: long·long overflows silently
            # at web-scale cumulative counts
            F.col("__pos").cast("double") * F.col("__cp")
            / (F.col("__cp") + F.col("__cn"))
        ).alias("__ap"),
    ).select(
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
        F.round(F.col("__P") / (F.col("__P") + F.col("__N")), 6)
        .alias("prevalence"),
        F.when(
            F.col("__P") > 0,
            F.round(F.col("__ap") / F.col("__P"), 6),
        ).alias("pr_auc"),
    )


def logreg_pr_auc_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    iterations: int = 8,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``logreg_pr_auc`` — shared GD CTEs, identical
    round-6 sigmoid, the same descending-score histogram walk and
    recall-weighted precision sum."""
    ctes, prev, marg, names = _logreg_oracle_parts(
        table, label_sql, features_sql, iterations, lr
    )
    ctes.append(
        f"""hist AS (SELECT round(1.0 / (1.0 + exp(-({marg}))), 6) AS p,
      CAST(sum(y) AS BIGINT) AS pos,
      CAST(count(*) - sum(y) AS BIGINT) AS neg
      FROM z CROSS JOIN {prev} GROUP BY 1)"""
    )
    ctes.append(
        """prcum AS (SELECT pos, neg,
      sum(pos) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cp,
      sum(neg) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cn
      FROM hist)"""
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + """
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           round(CAST(sum(pos) AS DOUBLE) / (sum(pos) + sum(neg)), 6)
             AS prevalence,
           CASE WHEN sum(pos) > 0
                THEN round(sum(CAST(pos AS DOUBLE) * cp / (cp + cn))
                           / sum(pos), 6)
                ELSE NULL END AS pr_auc
    FROM prcum"""
    )


def logreg_holdout_eval(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    test_pred: Column,
    iterations: int = 8,
    lr: float = 0.5,
) -> DataFrame:
    """GENERALIZATION contract for the classifier: fit on the rows where
    ``test_pred`` is false, score the held-out rows with the TRAINING
    statistics (the train-fold means/stds standardize the unseen
    features — never the test fold's own), and report test accuracy and
    test AUC. ``test_pred`` must be a deterministic boolean over the
    input (hash-split it — the sampling module's md5-prefix discipline)
    so both engines hold identical folds.

    Returns one row: (n_train, n_test, test_accuracy, test_auc) — AUC
    NULL when the held-out fold is single-class.

    Scale shape: the shared GD fit over the train fold, then ONE
    codegen scoring scan over the test fold (train st + weights are two
    broadcast 1-row frames) feeding the bounded score-histogram AUC and
    a 1-row accuracy aggregate."""
    names = [n for n, _ in features]
    # evaluate fold predicate, label and features ONCE, cached (r13):
    # the GD fit and the test-fold scoring previously each re-ran the
    # string-heavy feature expressions over the source scan
    prep = ensure_parallelism(df).select(
        test_pred.alias("__t"),
        label.cast("double").alias("__y0"),
        *[expr.cast("double").alias(n) for n, expr in features],
    ).persist()
    train = prep.filter(~F.col("__t"))
    test = prep.filter(F.col("__t"))
    _z, w, _names, margin, st = _logreg_fit(
        train, F.col("__y0"), [(n, F.col(n)) for n in names],
        iterations, lr
    )
    zt = (
        test.select(
            F.col("__y0").alias("__y"),
            *[F.col(n).alias(n) for n in names],
        )
        .crossJoin(F.broadcast(st))
        .select(
            "__y",
            *[
                F.round(
                    (F.col(n) - F.col(f"__m_{n}")) / F.col(f"__s_{n}"), 6
                ).alias(n)
                for n in names
            ],
        )
        .crossJoin(F.broadcast(w))
        .localCheckpoint(eager=False)
    )
    acc = zt.agg(
        F.count("*").alias("__nt"),
        F.round(
            F.avg(
                F.when(
                    (F.round(margin(), 6) >= 0) == (F.col("__y") == 1.0),
                    F.lit(1.0),
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("__acc"),
    )
    ntr = train.agg(F.count("*").alias("__ntr"))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin())), 6)
    scored = zt.select(F.col("__y"), p.alias("__p"))
    return (
        _auc_over_scores(scored)
        .crossJoin(F.broadcast(acc))
        .crossJoin(F.broadcast(ntr))
        .select(
            F.col("__ntr").cast("long").alias("n_train"),
            F.col("__nt").cast("long").alias("n_test"),
            F.col("__acc").alias("test_accuracy"),
            F.when(
                (F.col("__P") > 0) & (F.col("__N") > 0),
                F.round(F.col("__U") / (F.col("__P") * F.col("__N")), 6),
            ).alias("test_auc"),
        )
    )


def logreg_holdout_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    test_pred_sql: str,
    iterations: int = 8,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``logreg_holdout_eval`` — the GD CTEs over the
    train fold, then the identical train-statistics scoring of the test
    fold, accuracy and histogram AUC."""
    names = [n for n, _ in features_sql]
    ctes, prev, marg, _ = _logreg_oracle_parts(
        f"(SELECT * FROM {table} WHERE NOT ({test_pred_sql}))",
        label_sql, features_sql, iterations, lr,
    )
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql
    )
    z_sel = ", ".join(
        f"round(({n} - m_{n}) / s_{n}, 6) AS {n}" for n in names
    )
    ctes.append(
        f"""test0 AS MATERIALIZED (
      SELECT CAST({label_sql} AS DOUBLE) AS y, {feat_sel}
      FROM {table} WHERE ({test_pred_sql}))"""
    )
    ctes.append(
        f"""zt AS MATERIALIZED (
      SELECT y, {z_sel} FROM test0 CROSS JOIN st CROSS JOIN {prev})"""
    )
    ctes.append(
        f"""tacc AS (SELECT count(*) AS nt, round(avg(CASE WHEN
      (round({marg}, 6) >= 0) = (y = 1.0) THEN 1.0 ELSE 0.0 END), 6)
      AS a FROM zt CROSS JOIN {prev})"""
    )
    ctes.append(
        f"""thist AS (SELECT round(1.0 / (1.0 + exp(-({marg}))), 6) AS p,
      CAST(sum(y) AS BIGINT) AS pos,
      CAST(count(*) - sum(y) AS BIGINT) AS neg
      FROM zt CROSS JOIN {prev} GROUP BY 1)"""
    )
    ctes.append(
        """tcontrib AS (SELECT pos, neg,
      (sum(neg) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND
                      CURRENT ROW) - neg) * pos
      + pos * neg / 2.0 AS u
      FROM thist)"""
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + """
    SELECT CAST((SELECT count(*) FROM raw) AS BIGINT) AS n_train,
           CAST(tacc.nt AS BIGINT) AS n_test,
           tacc.a AS test_accuracy,
           CASE WHEN sum(pos) > 0 AND sum(neg) > 0
                THEN round(sum(u) / (sum(pos) * sum(neg)), 6)
                ELSE NULL END AS test_auc
    FROM tcontrib CROSS JOIN tacc
    GROUP BY tacc.nt, tacc.a"""
    )


def decision_tree_holdout(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    test_pred: Column,
    bins: int = 16,
    depth: int = 2,
) -> DataFrame:
    """GENERALIZATION contract for the histogram tree, mirroring
    ``logreg_holdout_eval``: fit on the rows where ``test_pred`` is
    false, then route the UNSEEN fold through the learned tree — test
    rows are binned with the TRAIN fold's min/width (no test-
    distribution leakage) and replay the per-level winner reassignment
    joins, landing each row at a leaf the training run created. Returns
    the held-out confusion cells (actual, predicted, cnt).

    Scale shape: the training build, then per level one broadcast hash
    join of the ≤ 2^level-row winner frame against the test fold, and
    the leaf-map broadcast join — the test fold is scanned once."""
    names = [n for n, _ in features]
    # evaluate fold predicate, label and features ONCE, cached (r13):
    # the training build and the test-fold routing previously each
    # re-ran the string-heavy feature expressions over the source scan
    prep = ensure_parallelism(df).select(
        test_pred.alias("__t"),
        label.alias("__l0"),
        *[e.alias(n) for n, e in features],
    ).persist()
    train = prep.filter(~F.col("__t"))
    test = prep.filter(F.col("__t"))
    feats_c = [(n, F.col(n)) for n, _e in features]
    _tree, _assigned, _st, _wl, pym = _decision_tree_build(
        train, F.col("__l0"), feats_c, bins, depth, keep_assigned=False
    )
    # ONE-PASS routing (r14 — the rf_holdout fusion, VERDICT r13 #2):
    # the model is driver-side literals, so the per-level
    # broadcast-join replay collapses into one literal CASE expression
    # over a single scan of the test fold — identical bin arithmetic,
    # winner maps and leaf predicts on identical literal operands.
    tb = test.select(
        F.col("__l0").cast("bigint").alias("__y"),
        *[F.col(n).cast("double").alias(n) for n in names],
    ).na.drop(subset=["__y", *names])
    return (
        tb.select(
            "__y", _tree_route_predict(names, bins, pym).alias("__p")
        )
        .groupBy(
            F.col("__y").alias("actual"),
            F.col("__p").alias("predicted"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("actual").cast("long").alias("actual"),
            F.col("predicted").cast("long").alias("predicted"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def decision_tree_holdout_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    test_pred_sql: str,
    bins: int = 16,
    depth: int = 2,
) -> str:
    """DuckDB replica of ``decision_tree_holdout`` — the tree CTEs over
    the train-filtered table, then the identical train-statistics
    binning and winner-join routing of the test fold."""
    names = [n for n, _ in features_sql]
    ctes, body = _tree_oracle_parts(
        f"(SELECT * FROM {table} WHERE NOT ({test_pred_sql}))",
        label_sql, features_sql, bins, depth,
    )
    ctes.append(
        f"""tree AS MATERIALIZED (
      SELECT node,
             CAST(CASE WHEN pos * 2 >= n THEN 1 ELSE 0 END AS BIGINT)
               AS predict
      FROM ({body}) t)"""
    )
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql
    )
    null_guard = " AND ".join(
        [f"({label_sql}) IS NOT NULL"]
        + [f"({e}) IS NOT NULL" for _, e in features_sql]
    )
    bin_sel = ", ".join(
        f"CASE WHEN w_{n} = 0 THEN 0 ELSE least({bins - 1}, greatest(0, "
        f"CAST(floor(({n} - mn_{n}) / w_{n}) AS INT))) END AS b_{n}"
        for n in names
    )
    bcols = ", ".join(f"b_{n}" for n in names)
    case_bin = (
        "CASE w.f "
        + " ".join(f"WHEN '{n}' THEN a.b_{n}" for n in names)
        + " END"
    )
    ctes.append(
        f"""tb0 AS MATERIALIZED (
      SELECT y, {bin_sel}, CAST(1 AS BIGINT) AS node FROM (
        SELECT CAST({label_sql} AS BIGINT) AS y, {feat_sel}
        FROM {table} WHERE ({test_pred_sql}) AND {null_guard}) q
      CROSS JOIN stw)"""
    )
    for lvl in range(depth):
        ctes.append(
            f"""tb{lvl + 1} AS MATERIALIZED (
      SELECT a.y, {bcols},
             CASE WHEN w.node IS NULL THEN a.node
                  ELSE a.node * 2 + CASE WHEN {case_bin} <= w.bin
                                         THEN 0 ELSE 1 END
             END AS node
      FROM tb{lvl} a LEFT JOIN w{lvl} w ON w.node = a.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(a.y AS BIGINT) AS actual, t.predict AS predicted,
           CAST(count(*) AS BIGINT) AS cnt
    FROM tb{depth} a JOIN tree t ON t.node = a.node
    GROUP BY a.y, t.predict"""
    )


def _boost_score(
    fold: DataFrame,
    target: Column,
    features: list[tuple[str, Column]],
    bins: int,
    pym: dict,
    out_col: str,
) -> DataFrame:
    """Null-guarded fold scored through the boost payload as ONE
    literal projection (r14): train-stats bins per feature, then the
    additive model — base + per-surviving-round
    ``when(bin_f <= b, lv).otherwise(rv)``, left-associated in round
    order, exactly the training-side update arithmetic on identical
    literal operands. Returns (__y, <out_col>)."""
    names = [n for n, _ in features]
    mn, wd = pym["mn"], pym["wd"]
    base_rows = fold.select(
        target.cast("double").alias("__y"),
        *[expr.cast("double").alias(n) for n, expr in features],
    ).na.drop(subset=["__y", *names])
    bincol = {
        n: F.when(_dlit(wd[n]) == F.lit(0.0), F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(n) - _dlit(mn[n])) / _dlit(wd[n])
                    ).cast("int"),
                ),
            )
        )
        .cast("int")
        for n in names
    }
    pred = _dlit(pym["f0"])
    for w in pym["winners"]:
        if w is None:
            continue
        f, bn, lv, rv = w
        pred = pred + F.when(
            bincol[f] <= F.lit(bn), _dlit(lv)
        ).otherwise(_dlit(rv))
    return base_rows.select("__y", pred.alias(out_col))


def boost_stumps_holdout(
    df: DataFrame,
    target: Column,
    features: list[tuple[str, Column]],
    test_pred: Column,
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
) -> DataFrame:
    """GENERALIZATION contract for the boosted stumps — the overfit
    detector for the regression family: fit on the rows where
    ``test_pred`` is false, bin the UNSEEN fold with the TRAIN fold's
    min/width, apply the additive model (base + per-stump leaf values,
    left-associated in round order — the exact training arithmetic) and
    compare held-out RMSE to train RMSE.

    Returns one row: (n_train, n_test, train_rmse, test_rmse).

    Scale shape: the training fit, then ONE codegen scan of the test
    fold through ``rounds`` broadcast 1-row stump joins and a 1-row
    aggregate."""
    names = [n for n, _ in features]
    b = ensure_parallelism(df)
    train = b.filter(~test_pred)
    test = b.filter(test_pred)
    model, _st, _fbase, _wf, _, pym = _boost_fit(
        train, target, features, rounds, bins, lr
    )
    # ONE-PASS literal scoring (r14 — the rf_holdout VERDICT #2 shape):
    # the model is driver-side scalars after the fit, so the test bins
    # and the additive prediction are literal expressions over one scan
    # — no st/base crossJoins, no per-round broadcast-join chain. The
    # arithmetic is the old chain's own on identical literal operands
    # (per surviving round: pred + when(bin_f <= b, lv).otherwise(rv),
    # left-associated in round order; skipped rounds left pred intact).
    tb = _boost_score(test, target, features, bins, pym, "__pred")
    test_stats = tb.agg(
        F.count("*").alias("__nt"),
        F.round(
            F.sqrt(
                F.avg(
                    (F.col("__y") - F.col("__pred"))
                    * (F.col("__y") - F.col("__pred"))
                )
            ),
            6,
        ).alias("__trm"),
    )
    ntr = train.select(
        target.cast("double").alias("__y"),
        *[expr.cast("double").alias(n) for n, expr in features],
    ).na.drop(subset=["__y", *names]).agg(F.count("*").alias("__ntr"))
    train_rmse = model.agg(F.max("train_rmse").alias("__rm"))
    return (
        test_stats.crossJoin(F.broadcast(ntr))
        .crossJoin(F.broadcast(train_rmse))
        .select(
            F.col("__ntr").cast("long").alias("n_train"),
            F.col("__nt").cast("long").alias("n_test"),
            F.col("__rm").alias("train_rmse"),
            F.col("__trm").alias("test_rmse"),
        )
    )


def boost_stumps_holdout_oracle_sql(
    table: str,
    target_sql: str,
    features_sql: list[tuple[str, str]],
    test_pred_sql: str,
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``boost_stumps_holdout`` — the boosting CTEs
    over the train-filtered table, then the identical train-statistics
    binning and additive scoring of the test fold."""
    names = [n for n, _ in features_sql]
    # rebuild the shared fit CTEs over the filtered train table by
    # reusing the train oracle's WITH clause up to r{rounds}: simplest
    # robust route — regenerate them from the same generator body.
    train_tbl = f"(SELECT * FROM {table} WHERE NOT ({test_pred_sql}))"
    full = boost_stumps_oracle_sql(
        train_tbl, target_sql, features_sql, rounds, bins, lr
    )
    # strip the final SELECT (everything after the last CTE) — the CTE
    # list ends with 'rmse AS (...)' which we keep as train rmse
    cut = full.rindex("\n    SELECT m.round")
    ctes_text = full[:cut]
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql
    )
    null_guard = " AND ".join(
        [f"({target_sql}) IS NOT NULL"]
        + [f"({e}) IS NOT NULL" for _, e in features_sql]
    )
    bin_sel = ", ".join(
        f"CASE WHEN w_{n} = 0 THEN 0 ELSE least({bins - 1}, greatest(0, "
        f"CAST(floor(({n} - mn_{n}) / w_{n}) AS INT))) END AS b_{n}"
        for n in names
    )
    bcols = ", ".join(f"b_{n}" for n in names)
    case_bin = (
        "CASE s.f "
        + " ".join(f"WHEN '{n}' THEN r.b_{n}" for n in names)
        + " END"
    )
    extra = [
        f"""tb0 AS MATERIALIZED (
      SELECT y, {bin_sel}, f0 AS pred FROM (
        SELECT CAST({target_sql} AS DOUBLE) AS y, {feat_sel}
        FROM {table} WHERE ({test_pred_sql}) AND {null_guard}) q
      CROSS JOIN stw CROSS JOIN base)"""
    ]
    for k in range(1, rounds + 1):
        extra.append(
            f"""tb{k} AS MATERIALIZED (
      SELECT r.y, {bcols},
             CASE WHEN s.f IS NULL THEN r.pred
                  ELSE r.pred + CASE WHEN {case_bin} <= s.bin
                                     THEN s.lv ELSE s.rv END
             END AS pred
      FROM tb{k - 1} r LEFT JOIN s{k} s ON TRUE)"""
        )
    return (
        ctes_text
        + ",\n    "
        + ",\n    ".join(extra)
        + f"""
    SELECT CAST((SELECT count(*) FROM raw) AS BIGINT) AS n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           (SELECT v FROM rmse) AS train_rmse,
           round(sqrt(avg((y - pred) * (y - pred))), 6) AS test_rmse
    FROM tb{rounds}"""
    )

def _logit_boost_fit(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
):
    """Gradient boosting for BINARY CLASSIFICATION with depth-1
    histogram trees — the log-loss companion to ``_boost_fit``'s
    LS_Boost (VERDICT r8 #3): F₀ is the 6-dp log-odds of the clamped
    base rate; each round fits one stump to the log-loss
    pseudo-residuals rᵢ = yᵢ − σ(Fᵢ) by the SAME equi-width-histogram
    split search (variance-reduction gain over the residual sums — the
    unit-hessian gradient step LightGBM's `hist` uses) and adds
    ν·leaf-mean-residual to the margin.

    Determinism/oracle contract: the margin F is row-local exact double
    arithmetic (f0 and every leaf value are 6-dp constants added
    left-associated in round order, so both engines hold bit-identical
    margins); the per-row residual uses the 6-dp-ROUNDED sigmoid
    r = y − round(σ(F), 6) — identical across engines by the
    calibration/AUC discipline — so residual sums are sums of identical
    values, still rounded 6 dp before use; gain 9 dp argmax'd under the
    total (gain DESC, feature, bin) order. A round with no valid split
    adds nothing and emits no stump row.

    Returns (model, st, base, winner_frames, names): model has one row
    per term — round 0 the base margin (feature 'base', both values
    f0), round k the stump — each carrying train_logloss of the final
    margin (probabilities clamped to [1e-6, 1−1e-6] before the log).

    Scale shape: identical to ``_boost_fit`` — the binned frame is
    built once and checkpointed; each round is ONE codegen scan into a
    map-side-combined F·bins-cell residual histogram plus a broadcast
    1-row stump joined back."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    names = [n for n, _ in features]
    spark = df.sparkSession
    raw = (
        ensure_parallelism(df)
        .select(
            label.cast("double").alias("__y"),
            *[expr.cast("double").alias(n) for n, expr in features],
        )
        .na.drop(subset=["__y", *names])
        .persist()
    )
    # r13: same driver-side split search as _boost_fit; the margin is
    # an expression chain over the cached binned frame (f0 and every
    # leaf value are collected 6-dp constants, so per-row margins stay
    # bit-identical to the broadcast-join formulation)
    strow = raw.agg(
        *[F.min(n).alias(f"__mn_{n}") for n in names],
        *[F.max(n).alias(f"__mx_{n}") for n in names],
    ).select(
        "*",
        *[
            ((F.col(f"__mx_{n}") - F.col(f"__mn_{n}")) / F.lit(float(bins)))
            .alias(f"__w_{n}")
            for n in names
        ],
    ).first()
    st = _row1(spark, {k: strow[k] for k in strow.asDict()})
    mn = {n: strow[f"__mn_{n}"] for n in names}
    wd = {n: strow[f"__w_{n}"] for n in names}
    binned = raw.select(
        "__y",
        *[
            F.when(_dlit(wd[n]) == F.lit(0.0), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col(n) - _dlit(mn[n])) / _dlit(wd[n])
                        ).cast("int"),
                    ),
                )
            )
            .cast("int")
            .alias(f"__b_{n}")
            for n in names
        ],
    )
    pbar = F.least(
        F.greatest(F.avg("__y"), F.lit(0.000001)), F.lit(0.999999)
    )
    f0 = raw.agg(
        F.round(F.log(pbar / (F.lit(1.0) - pbar)), 6).alias("__f0")
    ).first()["__f0"]
    base = _row1(spark, {"__f0": f0})
    pred = binned.select(
        "__y",
        *[f"__b_{n}" for n in names],
        _dlit(f0).alias("__m"),
    )
    stack_expr = "stack({}, {})".format(
        len(names), ", ".join(f"'{n}', __b_{n}" for n in names)
    )
    sigmoid = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m"))), 6
    )
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    winner_schema = StructType([
        StructField("__f", StringType()),
        StructField("__bin", IntegerType()),
        StructField("__lv", DoubleType()),
        StructField("__rv", DoubleType()),
    ])
    stump_rows: list[tuple] = []
    winner_frames: list[DataFrame] = []
    winners: list[tuple | None] = []  # (f, b, lv, rv) per round (r14)
    for k in range(1, rounds + 1):
        hrows = (
            pred.select(
                (F.col("__y") - sigmoid).alias("__r"),
                F.expr(stack_expr).alias("__f", "__bin"),
            )
            .groupBy("__f", "__bin")
            .agg(F.count("*").alias("__c"), F.sum("__r").alias("__s"))
            .collect()
        )
        hist: dict = {}
        for r in hrows:
            hist.setdefault(r["__f"], []).append(
                (r["__bin"], r["__c"], r["__s"])
            )
        first = sorted(hist.get(names[0], []))
        ct = sum(c for _b, c, _s in first)
        srt = _pyround(sum(s for _b, _c, s in first), 6)
        best = None  # (key, f, bin, lv, rv)
        for f, cells in sorted(hist.items()):
            cl = 0
            sl_raw = 0.0
            for b, c, s in sorted(cells):
                cl += c
                sl_raw += s
                sl = _pyround(sl_raw, 6)
                if not (0 < cl < ct):
                    continue
                gain = _pyround(
                    sl * sl / cl
                    + (srt - sl) * (srt - sl) / (ct - cl),
                    9,
                )
                key = (-gain, f, b)
                if best is None or key < best[0]:
                    lv = _pyround(lr * sl / cl, 6)
                    rv = _pyround(lr * (srt - sl) / (ct - cl), 6)
                    best = (key, f, b, lv, rv)
        if best is not None:
            _k0, f, b, lv, rv = best
            winner_frames.append(
                spark.createDataFrame([(f, b, lv, rv)], winner_schema)
            )
            winners.append((f, b, lv, rv))
            stump_rows.append(
                (k, f, mn[f] + (b + 1) * wd[f], lv, rv)
            )
            pred = pred.select(
                "__y",
                *[f"__b_{n}" for n in names],
                (
                    F.col("__m")
                    + F.when(
                        F.col(f"__b_{f}") <= F.lit(b), _dlit(lv)
                    ).otherwise(_dlit(rv))
                ).alias("__m"),
            )
        else:
            winner_frames.append(
                spark.createDataFrame([], winner_schema)
            )
            winners.append(None)
    pc = F.least(F.greatest(sigmoid, F.lit(0.000001)), F.lit(0.999999))
    loss = pred.agg(
        F.round(
            F.avg(
                -(
                    F.col("__y") * F.log(pc)
                    + (F.lit(1.0) - F.col("__y")) * F.log(F.lit(1.0) - pc)
                )
            ),
            6,
        ).alias("__ll")
    )
    model_schema = StructType([
        StructField("round", LongType()),
        StructField("feature", StringType()),
        StructField("__thr", DoubleType()),
        StructField("left_value", DoubleType()),
        StructField("right_value", DoubleType()),
    ])
    out = spark.createDataFrame(
        [(0, "base", None, f0, f0)]
        + [(k, f, thr, lv, rv) for k, f, thr, lv, rv in stump_rows],
        model_schema,
    )
    model = out.crossJoin(F.broadcast(loss)).select(
        "round", "feature",
        F.round(F.col("__thr"), 6).alias("threshold"),
        "left_value", "right_value",
        F.col("__ll").alias("train_logloss"),
    )
    payload = {"mn": mn, "wd": wd, "f0": f0, "winners": winners}
    return model, st, base, winner_frames, names, payload


def logit_boost_train(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
) -> DataFrame:
    """Train log-loss gradient-boosted classification stumps; returns
    the model frame (round, feature, threshold, left_value,
    right_value, train_logloss). Algorithm and determinism contracts:
    ``_logit_boost_fit``."""
    return _logit_boost_fit(df, label, features, rounds, bins, lr)[0]


def logit_boost_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``logit_boost_train`` — the identical
    round-by-round dataflow as CTEs: 6-dp log-odds base, per-round
    residual r = y − round(σ(margin), 6), residual sums 6 dp, gain
    9 dp, leaf values 6 dp, margin updates left-associated."""
    names = [n for n, _ in features_sql]
    first = names[0]
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql
    )
    null_guard = " AND ".join(
        [f"({label_sql}) IS NOT NULL"]
        + [f"({e}) IS NOT NULL" for _, e in features_sql]
    )
    st_sel = ", ".join(
        f"min({n}) AS mn_{n}, max({n}) AS mx_{n}" for n in names
    )
    w_sel = ", ".join(
        f"(mx_{n} - mn_{n}) / {float(bins)!r} AS w_{n}" for n in names
    )
    bin_sel = ", ".join(
        f"CASE WHEN w_{n} = 0 THEN 0 ELSE least({bins - 1}, greatest(0, "
        f"CAST(floor(({n} - mn_{n}) / w_{n}) AS INT))) END AS b_{n}"
        for n in names
    )
    fstats = " UNION ALL ".join(
        f"SELECT '{n}' AS feature, mn_{n} AS mn, w_{n} AS w FROM stw"
        for n in names
    )
    bcols = ", ".join(f"b_{n}" for n in names)
    sig = "round(1.0 / (1.0 + exp(-m)), 6)"
    unpivot_tpl = "\n      UNION ALL ".join(
        f"SELECT y - {sig} AS r, '{n}' AS f, b_{n} AS bin FROM {{src}}"
        for n in names
    )
    case_bin = (
        "CASE s.f "
        + " ".join(f"WHEN '{n}' THEN r.b_{n}" for n in names)
        + " END"
    )
    pbar = "least(greatest(avg(y), 0.000001), 0.999999)"
    ctes = [
        f"""raw AS MATERIALIZED (
      SELECT CAST({label_sql} AS DOUBLE) AS y, {feat_sel}
      FROM {table} WHERE {null_guard})""",
        f"st AS MATERIALIZED (SELECT {st_sel} FROM raw)",
        f"stw AS MATERIALIZED (SELECT *, {w_sel} FROM st)",
        f"base AS MATERIALIZED (SELECT round(ln({pbar} / (1.0 - {pbar})), "
        "6) AS f0 FROM raw)",
        f"""p0 AS MATERIALIZED (
      SELECT y, {bin_sel}, f0 AS m
      FROM raw CROSS JOIN stw CROSS JOIN base)""",
        f"fstats AS MATERIALIZED ({fstats})",
    ]
    stump_sel = []
    for k in range(1, rounds + 1):
        prev = f"p{k - 1}"
        up = unpivot_tpl.format(src=prev)
        ctes.append(
            f"""h{k} AS MATERIALIZED (
      SELECT f, bin, count(*) AS c, sum(r) AS s FROM (
      {up}) u GROUP BY f, bin)"""
        )
        ctes.append(
            f"""t{k} AS MATERIALIZED (
      SELECT sum(c) AS ct, round(sum(s), 6) AS srt
      FROM h{k} WHERE f = '{first}')"""
        )
        ctes.append(
            f"""s{k} AS MATERIALIZED (
      SELECT f, bin,
             round({lr!r} * sl / cl, 6) AS lv,
             round({lr!r} * (srt - sl) / (ct - cl), 6) AS rv
      FROM (
        SELECT *, row_number() OVER (ORDER BY
          round(sl * sl / cl + (srt - sl) * (srt - sl) / (ct - cl), 9)
            DESC, f, bin) AS rn
        FROM (
          SELECT h.f, h.bin,
                 sum(h.c) OVER (PARTITION BY h.f ORDER BY h.bin) AS cl,
                 round(sum(h.s) OVER (PARTITION BY h.f ORDER BY h.bin),
                       6) AS sl,
                 t.ct, t.srt
          FROM h{k} h CROSS JOIN t{k} t) c
        WHERE cl > 0 AND cl < ct) v
      WHERE rn = 1)"""
        )
        ctes.append(
            f"""p{k} AS MATERIALIZED (
      SELECT r.y, {bcols},
             CASE WHEN s.f IS NULL THEN r.m
                  ELSE r.m + CASE WHEN {case_bin} <= s.bin
                                  THEN s.lv ELSE s.rv END
             END AS m
      FROM {prev} r LEFT JOIN s{k} s ON TRUE)"""
        )
        stump_sel.append(
            f"""SELECT CAST({k} AS BIGINT) AS round, s.f AS feature,
             round(fs.mn + (s.bin + 1) * fs.w, 6) AS threshold,
             s.lv AS left_value, s.rv AS right_value
      FROM s{k} s JOIN fstats fs ON fs.feature = s.f"""
        )
    pc = f"least(greatest({sig}, 0.000001), 0.999999)"
    ctes.append(
        f"""loss AS (SELECT round(avg(-(y * ln(p) + (1.0 - y) *
      ln(1.0 - p))), 6) AS v
      FROM (SELECT y, {pc} AS p FROM p{rounds}))"""
    )
    body = "\n      UNION ALL ".join(
        [
            "SELECT CAST(0 AS BIGINT) AS round, 'base' AS feature, "
            "CAST(NULL AS DOUBLE) AS threshold, f0 AS left_value, "
            "f0 AS right_value FROM base"
        ]
        + stump_sel
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT m.round, m.feature, m.threshold, m.left_value, m.right_value,
           loss.v AS train_logloss
    FROM ({body}) m CROSS JOIN loss"""
    )


def logit_boost_holdout(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    test_pred: Column,
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
) -> DataFrame:
    """GENERALIZATION contract for the classification booster,
    evaluated with the logreg fold's metrics: fit on the rows where
    ``test_pred`` is false, bin the UNSEEN fold with the TRAIN fold's
    min/width, apply the additive margin (base + per-stump leaf values,
    left-associated — the exact training arithmetic), and report
    held-out accuracy (margin ≥ 0 ⇔ positive) and the histogram
    ROC-AUC over the 6-dp sigmoid scores (``_auc_over_scores``).

    Returns one row: (n_train, n_test, test_accuracy, test_auc) — AUC
    NULL when the held-out fold is single-class.

    Scale shape: the training fit, then ONE codegen scan of the test
    fold through ``rounds`` broadcast 1-row stump joins feeding the
    bounded score-histogram AUC and a 1-row accuracy aggregate."""
    names = [n for n, _ in features]
    b = ensure_parallelism(df)
    train = b.filter(~test_pred)
    test = b.filter(test_pred)
    _model, _st, _fbase, _wf, _, pym = _logit_boost_fit(
        train, label, features, rounds, bins, lr
    )
    # ONE-PASS literal scoring (r14 — see boost_stumps_holdout): the
    # additive margin as a literal expression chain over one scan.
    tb = _boost_score(test, label, features, bins, pym, "__m")
    tb = tb.localCheckpoint(eager=False)
    acc = tb.agg(
        F.count("*").alias("__nt"),
        F.round(
            F.avg(
                F.when(
                    (F.col("__m") >= 0) == (F.col("__y") == 1.0),
                    F.lit(1.0),
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("__acc"),
    )
    ntr = train.select(
        label.cast("double").alias("__y"),
        *[expr.cast("double").alias(n) for n, expr in features],
    ).na.drop(subset=["__y", *names]).agg(F.count("*").alias("__ntr"))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m"))), 6)
    scored = tb.select(F.col("__y"), p.alias("__p"))
    return (
        _auc_over_scores(scored)
        .crossJoin(F.broadcast(acc))
        .crossJoin(F.broadcast(ntr))
        .select(
            F.col("__ntr").cast("long").alias("n_train"),
            F.col("__nt").cast("long").alias("n_test"),
            F.col("__acc").alias("test_accuracy"),
            F.when(
                (F.col("__P") > 0) & (F.col("__N") > 0),
                F.round(F.col("__U") / (F.col("__P") * F.col("__N")), 6),
            ).alias("test_auc"),
        )
    )


def logit_boost_holdout_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    test_pred_sql: str,
    rounds: int = 4,
    bins: int = 16,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``logit_boost_holdout`` — the boosting CTEs
    over the train-filtered table, then the identical train-statistics
    binning, additive margin scoring, accuracy and histogram AUC."""
    names = [n for n, _ in features_sql]
    train_tbl = f"(SELECT * FROM {table} WHERE NOT ({test_pred_sql}))"
    full = logit_boost_oracle_sql(
        train_tbl, label_sql, features_sql, rounds, bins, lr
    )
    cut = full.rindex("\n    SELECT m.round")
    ctes_text = full[:cut]
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql
    )
    null_guard = " AND ".join(
        [f"({label_sql}) IS NOT NULL"]
        + [f"({e}) IS NOT NULL" for _, e in features_sql]
    )
    bin_sel = ", ".join(
        f"CASE WHEN w_{n} = 0 THEN 0 ELSE least({bins - 1}, greatest(0, "
        f"CAST(floor(({n} - mn_{n}) / w_{n}) AS INT))) END AS b_{n}"
        for n in names
    )
    bcols = ", ".join(f"b_{n}" for n in names)
    case_bin = (
        "CASE s.f "
        + " ".join(f"WHEN '{n}' THEN r.b_{n}" for n in names)
        + " END"
    )
    extra = [
        f"""tb0 AS MATERIALIZED (
      SELECT y, {bin_sel}, f0 AS m FROM (
        SELECT CAST({label_sql} AS DOUBLE) AS y, {feat_sel}
        FROM {table} WHERE ({test_pred_sql}) AND {null_guard}) q
      CROSS JOIN stw CROSS JOIN base)"""
    ]
    for k in range(1, rounds + 1):
        extra.append(
            f"""tb{k} AS MATERIALIZED (
      SELECT r.y, {bcols},
             CASE WHEN s.f IS NULL THEN r.m
                  ELSE r.m + CASE WHEN {case_bin} <= s.bin
                                  THEN s.lv ELSE s.rv END
             END AS m
      FROM tb{k - 1} r LEFT JOIN s{k} s ON TRUE)"""
        )
    extra.append(
        f"""tacc AS (SELECT count(*) AS nt, round(avg(CASE WHEN
      (m >= 0) = (y = 1.0) THEN 1.0 ELSE 0.0 END), 6) AS a
      FROM tb{rounds})"""
    )
    extra.append(
        f"""thist AS (SELECT round(1.0 / (1.0 + exp(-m)), 6) AS p,
      CAST(sum(y) AS BIGINT) AS pos,
      CAST(count(*) - sum(y) AS BIGINT) AS neg
      FROM tb{rounds} GROUP BY 1)"""
    )
    extra.append(
        """tcontrib AS (SELECT pos, neg,
      (sum(neg) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND
                      CURRENT ROW) - neg) * pos
      + pos * neg / 2.0 AS u
      FROM thist)"""
    )
    return (
        ctes_text
        + ",\n    "
        + ",\n    ".join(extra)
        + """
    SELECT CAST((SELECT count(*) FROM raw) AS BIGINT) AS n_train,
           CAST(tacc.nt AS BIGINT) AS n_test,
           tacc.a AS test_accuracy,
           CASE WHEN sum(pos) > 0 AND sum(neg) > 0
                THEN round(sum(u) / (sum(pos) * sum(neg)), 6)
                ELSE NULL END AS test_auc
    FROM tcontrib CROSS JOIN tacc
    GROUP BY tacc.nt, tacc.a"""
    )


def logreg_kfold_cv(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    fold_col: Column,
    k: int = 4,
    iterations: int = 8,
    lr: float = 0.5,
) -> DataFrame:
    """K-FOLD cross-validation as a first-class evaluator (VERDICT r8
    #4) — generalizes the single md5-prefix holdout: ``fold_col`` must
    be a deterministic int in [0, k) over the input (hash-split it —
    e.g. the md5 hex-digit mod k, so both engines hold identical
    folds); fold f is held out while the other k−1 folds train, via
    ``logreg_holdout_eval`` (train-fold standardization, margin
    accuracy, bounded score-histogram AUC). Beyond the per-fold rows,
    two aggregate rows carry the mean and the population std of the
    held-out metrics across folds — the variance of the generalization
    estimate a single holdout cannot measure.

    Returns k+2 rows: (fold '0'..'{k-1}', n_train, n_test, accuracy,
    auc) per fold, then ('mean', NULL, NULL, …) and ('std', NULL,
    NULL, …). AUC is NULL for single-class folds and mean/std skip
    NULLs (both engines agree).

    Scale shape: k independent holdout evaluations — each the shared
    GD fit over its train folds plus one scoring scan — unioned as a
    (k+2)-row model frame; the aggregate pass runs over k rows."""
    if k < 2:
        raise ValueError("k must be >= 2")
    # evaluate the fold id, label and features ONCE, cached (r13): each
    # fold's holdout otherwise re-runs the string-heavy feature
    # expressions over a fresh source scan
    prep = ensure_parallelism(df).select(
        fold_col.alias("__cvf"),
        label.cast("double").alias("__cvl"),
        *[e.cast("double").alias(n) for n, e in features],
    ).persist()
    prep.count()  # materialize once before the fused fit rounds
    names = [n for n, _ in features]
    # FUSED k-model fit (r14 — VERDICT r13 #3): all folds' gradients in
    # ONE conditional-aggregate scan per round (8 jobs, was ~k×9), each
    # fold's trajectory arithmetically identical to its independent
    # logreg_holdout_eval fit (see _logreg_fit_multi).
    train_conds = [F.col("__cvf") != F.lit(f) for f in range(k)]
    models = _logreg_fit_multi(
        prep, "__cvl", names, train_conds, iterations, lr
    )
    # FUSED eval: every row is the test row of exactly its own fold, so
    # ONE scan computes all folds' n_train/n_test/accuracy (conditional
    # aggregates) and ONE fold-partitioned histogram computes every
    # fold's tie-corrected AUC — the per-fold arithmetic (round-6
    # sigmoid scores, cumulative rank-sum, U/(P·N)) is
    # logreg_holdout_eval's own on identical operands; per-fold sums
    # stay exact (integer counts, half-integer U terms), so fusion
    # cannot move a rounding boundary.
    margins = [_logreg_margin_lit(models[f], names) for f in range(k)]
    agg_exprs = []
    for f in range(k):
        test_f = F.col("__cvf") == F.lit(f)
        agg_exprs.append(
            F.count(F.when(train_conds[f], F.lit(1))).alias(f"__ntr_{f}")
        )
        agg_exprs.append(
            F.count(F.when(test_f, F.lit(1))).alias(f"__nt_{f}")
        )
        agg_exprs.append(
            F.round(
                F.avg(
                    F.when(
                        test_f,
                        F.when(
                            (F.round(margins[f], 6) >= 0)
                            == (F.col("__cvl") == 1.0),
                            F.lit(1.0),
                        ).otherwise(F.lit(0.0)),
                    )
                ),
                6,
            ).alias(f"__acc_{f}")
        )
    arow = prep.agg(*agg_exprs)
    pcol = None
    for f in range(k):
        pf = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margins[f])), 6)
        cond = F.col("__cvf") == F.lit(f)
        pcol = F.when(cond, pf) if pcol is None else pcol.when(cond, pf)
    scored = prep.select(
        F.col("__cvf").alias("__fold"),
        F.col("__cvl").alias("__y"),
        pcol.alias("__p"),
    )
    hist = scored.groupBy("__fold", "__p").agg(
        F.sum("__y").cast("long").alias("__pos"),
        (F.count("*") - F.sum("__y")).cast("long").alias("__neg"),
    )
    win = (
        Window.partitionBy("__fold").orderBy("__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    contrib = hist.select(
        "__fold", "__pos", "__neg",
        (F.sum("__neg").over(win) - F.col("__neg")).alias("__nb"),
    ).select(
        "__fold", "__pos", "__neg",
        (
            F.col("__nb") * F.col("__pos")
            + F.col("__pos") * F.col("__neg") / F.lit(2.0)
        ).alias("__u"),
    )
    aucf = contrib.groupBy("__fold").agg(
        F.sum("__pos").alias("__P"),
        F.sum("__neg").alias("__N"),
        F.sum("__u").alias("__U"),
    )
    stacked = arow.select(
        F.expr(
            f"stack({k}, " + ", ".join(
                f"{f}, __ntr_{f}, __nt_{f}, __acc_{f}" for f in range(k)
            ) + ")"
        ).alias("__f", "__n_train", "__n_test", "__accuracy")
    )
    from census_data_pipeline_spark.sources.catalog import round_persist

    per_fold = round_persist(
        stacked.join(aucf, stacked["__f"] == aucf["__fold"], "left")
        .select(
            F.col("__f").cast("string").alias("fold"),
            F.col("__n_train").cast("long").alias("n_train"),
            F.col("__n_test").cast("long").alias("n_test"),
            F.col("__accuracy").alias("accuracy"),
            F.when(
                (F.col("__P") > 0) & (F.col("__N") > 0),
                F.round(F.col("__U") / (F.col("__P") * F.col("__N")), 6),
            ).alias("auc"),
        )
    )
    mean = per_fold.agg(
        F.round(F.avg("accuracy"), 6).alias("accuracy"),
        F.round(F.avg("auc"), 6).alias("auc"),
    ).select(
        F.lit("mean").alias("fold"),
        F.lit(None).cast("long").alias("n_train"),
        F.lit(None).cast("long").alias("n_test"),
        "accuracy", "auc",
    )
    std = per_fold.agg(
        F.round(
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.avg(F.col("accuracy") * F.col("accuracy"))
                    - F.avg("accuracy") * F.avg("accuracy"),
                )
            ),
            6,
        ).alias("accuracy"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.avg(F.col("auc") * F.col("auc"))
                    - F.avg("auc") * F.avg("auc"),
                )
            ),
            6,
        ).alias("auc"),
    ).select(
        F.lit("std").alias("fold"),
        F.lit(None).cast("long").alias("n_train"),
        F.lit(None).cast("long").alias("n_test"),
        "accuracy", "auc",
    )
    return per_fold.unionByName(mean).unionByName(std)


def logreg_kfold_cv_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    fold_sql: str,
    k: int = 4,
    iterations: int = 8,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``logreg_kfold_cv`` — each fold's full holdout
    query (its own WITH chain) wrapped as a derived table, unioned,
    plus the identical mean/std aggregate rows."""
    fold_parts = []
    for f in range(k):
        inner = logreg_holdout_oracle_sql(
            table, label_sql, features_sql,
            f"({fold_sql}) = {f}", iterations, lr,
        )
        fold_parts.append(
            f"""SELECT '{f}' AS fold, n_train, n_test,
      test_accuracy AS accuracy, test_auc AS auc FROM (
      {inner}) q{f}"""
        )
    folds = "\n      UNION ALL ".join(fold_parts)
    return f"""WITH folds AS MATERIALIZED (
      {folds})
    SELECT fold, n_train, n_test, accuracy, auc FROM folds
    UNION ALL
    SELECT 'mean', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           round(avg(accuracy), 6), round(avg(auc), 6) FROM folds
    UNION ALL
    SELECT 'std', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           round(sqrt(greatest(0.0,
             avg(accuracy * accuracy) - avg(accuracy) * avg(accuracy))), 6),
           round(sqrt(greatest(0.0,
             avg(auc * auc) - avg(auc) * avg(auc))), 6) FROM folds"""

def decision_tree_kfold_cv(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    fold_col: Column,
    k: int = 4,
    bins: int = 16,
    depth: int = 2,
) -> DataFrame:
    """K-fold cross-validation for the histogram tree (VERDICT r8 #4),
    mirroring ``logreg_kfold_cv``: fold f held out, the other folds
    train a ``decision_tree_holdout`` run whose held-out confusion
    cells collapse to one accuracy number (trace / total); mean and
    population std across folds follow as aggregate rows.

    Returns k+2 rows: (fold '0'..'{k-1}', n_test, accuracy) per fold,
    then ('mean', NULL, …) and ('std', NULL, …).

    Scale shape: k independent tree builds + test routings, each
    collapsing to a 1-row accuracy frame; aggregates run over k rows."""
    if k < 2:
        raise ValueError("k must be >= 2")
    # evaluate the fold id, label and features ONCE, cached (r13): each
    # fold's holdout otherwise re-runs the string-heavy feature
    # expressions over a fresh source scan
    prep = ensure_parallelism(df).select(
        fold_col.alias("__cvf"),
        label.alias("__cvl"),
        *[e.alias(n) for n, e in features],
    ).persist()
    prep.count()  # materialize once before the fused level scans
    names = [n for n, _ in features]
    # FUSED k-tree fit (r14 — VERDICT r13 #3): all folds' histograms in
    # ONE scan per level (depth jobs, was ~k×(depth+1)); each fold's
    # tree is bit-identical to its independent decision_tree_holdout
    # build (integer histograms — see _decision_tree_build_multi).
    built = _decision_tree_build_multi(
        prep,
        "__cvl",
        [(F.col("__cvf") != F.lit(f), names) for f in range(k)],
        bins,
        depth,
    )
    # FUSED eval: ONE conditional-aggregate scan routes every fold's
    # test rows through its own tree as a literal CASE expression
    # (_tree_route_predict) — the confusion-matrix collapse
    # round(n_correct / n_test, 6) on identical integers.
    y = F.col("__cvl").cast("bigint")
    vcond = y.isNotNull()
    for n in names:
        vcond = vcond & F.col(n).cast("double").isNotNull()
    agg_exprs = []
    for f in range(k):
        tcond = (F.col("__cvf") == F.lit(f)) & vcond
        pred = _tree_route_predict(names, bins, built[f][1])
        agg_exprs.append(
            F.count(F.when(tcond, F.lit(1))).alias(f"__nt_{f}")
        )
        agg_exprs.append(
            F.round(
                F.sum(
                    F.when(tcond & (pred == y), F.lit(1))
                    .otherwise(F.lit(0))
                )
                / F.count(F.when(tcond, F.lit(1))),
                6,
            ).alias(f"__acc_{f}")
        )
    from census_data_pipeline_spark.sources.catalog import round_persist

    per_fold = round_persist(
        prep.agg(*agg_exprs).select(
            F.expr(
                f"stack({k}, " + ", ".join(
                    f"'{f}', __nt_{f}, __acc_{f}" for f in range(k)
                ) + ")"
            ).alias("fold", "__nt", "accuracy")
        ).select(
            "fold",
            F.col("__nt").cast("long").alias("n_test"),
            "accuracy",
        )
    )
    mean = per_fold.agg(
        F.round(F.avg("accuracy"), 6).alias("accuracy")
    ).select(
        F.lit("mean").alias("fold"),
        F.lit(None).cast("long").alias("n_test"),
        "accuracy",
    )
    std = per_fold.agg(
        F.round(
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.avg(F.col("accuracy") * F.col("accuracy"))
                    - F.avg("accuracy") * F.avg("accuracy"),
                )
            ),
            6,
        ).alias("accuracy")
    ).select(
        F.lit("std").alias("fold"),
        F.lit(None).cast("long").alias("n_test"),
        "accuracy",
    )
    return per_fold.unionByName(mean).unionByName(std)


def decision_tree_kfold_cv_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    fold_sql: str,
    k: int = 4,
    bins: int = 16,
    depth: int = 2,
) -> str:
    """DuckDB replica of ``decision_tree_kfold_cv`` — each fold's full
    tree-holdout query wrapped as a derived table, collapsed to its
    accuracy, unioned, plus the identical mean/std aggregate rows."""
    fold_parts = []
    for f in range(k):
        inner = decision_tree_holdout_oracle_sql(
            table, label_sql, features_sql,
            f"({fold_sql}) = {f}", bins, depth,
        )
        fold_parts.append(
            f"""SELECT '{f}' AS fold, CAST(sum(cnt) AS BIGINT) AS n_test,
      round(sum(CASE WHEN actual = predicted THEN cnt ELSE 0 END)
            / CAST(sum(cnt) AS DOUBLE), 6) AS accuracy FROM (
      {inner}) q{f}"""
        )
    folds = "\n      UNION ALL ".join(fold_parts)
    return f"""WITH folds AS MATERIALIZED (
      {folds})
    SELECT fold, n_test, accuracy FROM folds
    UNION ALL
    SELECT 'mean', CAST(NULL AS BIGINT), round(avg(accuracy), 6)
    FROM folds
    UNION ALL
    SELECT 'std', CAST(NULL AS BIGINT),
           round(sqrt(greatest(0.0,
             avg(accuracy * accuracy) - avg(accuracy) * avg(accuracy))), 6)
    FROM folds"""


def _rf_feature_subset(names: list[str], t: int, m: int) -> list[str]:
    """Deterministic per-tree feature subsample shared by the engine and
    the oracle generator (no RNG): rank feature NAMES by md5('name:t')
    and keep the first ``m``, preserving the caller's feature order.
    Pure plan-time Python, so both sides compute the identical subset."""
    import hashlib

    ranked = sorted(
        names,
        key=lambda n: hashlib.md5(f"{n}:{t}".encode()).hexdigest(),
    )
    chosen = set(ranked[:m])
    return [n for n in names if n in chosen]


def _rf_keep(id_expr: Column, t: int, row_keep: int) -> Column:
    """Deterministic per-tree row subsample: keep rows whose md5 first
    hex digit of '<id>:<t>' is < ``row_keep`` (of 16) — the same
    md5-prefix discipline as the holdout split, varied per tree by the
    ':t' suffix so trees see different ~row_keep/16 bootstraps."""
    digit = F.conv(
        F.substring(F.md5(F.concat(id_expr, F.lit(f":{t}"))), 1, 1), 16, 10
    ).cast("int")
    return digit < F.lit(row_keep)


def _rf_keep_sql(id_sql: str, t: int, row_keep: int) -> str:
    return (
        f"(instr('0123456789abcdef', substr(md5(({id_sql}) || ':{t}'), "
        f"1, 1)) - 1) < {row_keep}"
    )


def _rf_m(n_features: int, features_per_tree: int | None) -> int:
    import math as _math

    if features_per_tree is not None:
        if not (1 <= features_per_tree <= n_features):
            raise ValueError("features_per_tree out of range")
        return features_per_tree
    return max(1, _math.isqrt(n_features - 1) + 1)  # ceil(sqrt(F))


def random_forest_train(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    id_expr: Column,
    n_trees: int = 5,
    row_keep: int = 12,
    bins: int = 16,
    depth: int = 2,
    features_per_tree: int | None = None,
) -> DataFrame:
    """Random forest over the histogram tree trainer (VERDICT r8 #7):
    ``n_trees`` independent depth-bounded trees, each fit by
    ``_decision_tree_build`` (unchanged — one codegen scan per level
    into a nodes·F·bins histogram) on a DETERMINISTIC subsample — rows
    whose md5 hex digit of '<id>:<t>' is < ``row_keep``/16, features
    the md5-ranked ``features_per_tree`` (default ceil(√F)) subset per
    tree — no RNG anywhere, so a DuckDB oracle reproduces every tree
    exactly. ``id_expr`` must be a row-unique STRING column/expression.

    Returns the forest frame: the per-tree node rows (tree, node,
    depth, kind, feature, threshold, n, pos, pos_rate, predict).
    Majority voting over the forest is ``random_forest_holdout``.

    Scale shape: n_trees × the single tree's cost — each tree's
    data-scale work is ``depth`` histogram scans of its subsample;
    nothing here is new shuffle machinery, so the single tree's 100×
    rehearsal carries over multiplied by a constant."""
    if n_trees < 1:
        raise ValueError("n_trees must be >= 1")
    if not (1 <= row_keep <= 16):
        raise ValueError("row_keep must be in [1, 16]")
    names = [n for n, _ in features]
    m = _rf_m(len(names), features_per_tree)
    # ONE pass evaluates the label, every feature and every tree's md5
    # keep flag, cached (r13): feature expressions are string-heavy
    # (length/replace over document text) and each tree previously
    # re-ran them — plus a fresh md5 scan — over the full source
    prep = ensure_parallelism(df).select(
        label.alias("__l0"),
        *[e.alias(n) for n, e in features],
        *[
            _rf_keep(id_expr, t, row_keep).alias(f"__keep_{t}")
            for t in range(n_trees)
        ],
    ).persist()
    prep.count()  # materialize once before the fused level scans
    # FUSED n_trees-histogram fit (r14 — VERDICT r13 #3): every tree's
    # level histogram in ONE scan (depth jobs, was ~n_trees×(depth+1));
    # trees bit-identical to the per-tree builds (integer histograms —
    # see _decision_tree_build_multi).
    specs = []
    for t in range(n_trees):
        keep_names = set(_rf_feature_subset(names, t, m))
        names_t = [n for n in names if n in keep_names]
        specs.append((F.col(f"__keep_{t}"), names_t))
    built = _decision_tree_build_multi(prep, "__l0", specs, bins, depth)
    spark = df.sparkSession
    out = None
    for t in range(n_trees):
        row = _tree_frame_from_rows(spark, built[t][0]).select(
            F.lit(t).cast("long").alias("tree"), "*"
        )
        out = row if out is None else out.unionByName(row)
    prep.unpersist()  # the models are driver-side literals now
    return out


def random_forest_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    id_sql: str,
    n_trees: int = 5,
    row_keep: int = 12,
    bins: int = 16,
    depth: int = 2,
    features_per_tree: int | None = None,
) -> str:
    """DuckDB replica of ``random_forest_train`` — each tree's full
    ``decision_tree_oracle_sql`` over its md5-filtered subsample and
    md5-ranked feature subset, wrapped as a derived table with its tree
    id and unioned."""
    names = [n for n, _ in features_sql]
    m = _rf_m(len(names), features_per_tree)
    parts = []
    for t in range(n_trees):
        keep_names = set(_rf_feature_subset(names, t, m))
        feats_t = [(n, e) for n, e in features_sql if n in keep_names]
        filt = (
            f"(SELECT * FROM {table} "
            f"WHERE {_rf_keep_sql(id_sql, t, row_keep)})"
        )
        inner = decision_tree_oracle_sql(filt, label_sql, feats_t,
                                         bins, depth)
        parts.append(
            f"SELECT CAST({t} AS BIGINT) AS tree, * FROM (\n{inner}\n"
            f") rf{t}"
        )
    return "\nUNION ALL\n".join(parts)


def random_forest_holdout(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    id_expr: Column,
    test_pred: Column,
    n_trees: int = 5,
    row_keep: int = 12,
    bins: int = 16,
    depth: int = 2,
    features_per_tree: int | None = None,
) -> DataFrame:
    """Generalization eval for the random forest: fit each tree on its
    deterministic subsample of the TRAIN fold (rows where ``test_pred``
    is false), route the unseen fold through every tree (test rows
    binned with each tree's train min/width — no leakage), and majority-
    vote (ties → 1, the leaf-predict convention). Test rows with a null
    label or any null feature are dropped once, so every tree votes on
    the identical fold. ``id_expr`` must be row-unique (it keys the
    vote combine).

    Returns n_trees+1 rows: (member '0'..'{n_trees-1}', n_train = that
    tree's post-null-drop subsample size, n_test, accuracy) per tree,
    then ('forest', NULL, n_test, accuracy) for the majority vote — the
    variance-reduction story in one frame.

    Scale shape: per tree the training build plus one broadcast-join
    routing pass over the test fold; the vote combine is one groupBy on
    the (n_test · n_trees)-row vote frame. Nothing touches the full
    corpus beyond the single-tree passes."""
    if n_trees < 1:
        raise ValueError("n_trees must be >= 1")
    if not (1 <= row_keep <= 16):
        raise ValueError("row_keep must be in [1, 16]")
    names = [n for n, _ in features]
    m = _rf_m(len(names), features_per_tree)
    # ONE pass evaluates the id, fold predicate, label, every feature
    # and every tree's md5 keep flag, cached (r13) — see
    # random_forest_train for the rationale
    prep = ensure_parallelism(df).select(
        id_expr.alias("__id"),
        test_pred.alias("__t"),
        label.alias("__l0"),
        *[e.alias(n) for n, e in features],
        *[
            _rf_keep(id_expr, t, row_keep).alias(f"__keep_{t}")
            for t in range(n_trees)
        ],
    ).persist()
    # one shared null-guarded test fold (ALL features) so every tree
    # votes on the same rows
    test = (
        prep.filter(F.col("__t"))
        .select(
            F.col("__l0").cast("bigint").alias("__y"),
            *[F.col(n).cast("double").alias(n) for n in names],
        )
        .na.drop(subset=["__y", *names])
    )
    prep.count()  # materialize once before the fused level scans
    # FUSED tree fits (r14 — VERDICT r13 #3): every tree's level
    # histogram in ONE scan of the cached prep (depth jobs, was
    # ~n_trees×(depth+1)); trees bit-identical to the per-tree builds
    # (integer histograms — see _decision_tree_build_multi).
    specs = []
    names_by_tree = []
    for t in range(n_trees):
        keep_names = set(_rf_feature_subset(names, t, m))
        names_t = [n for n in names if n in keep_names]
        names_by_tree.append(names_t)
        specs.append(
            ((~F.col("__t")) & F.col(f"__keep_{t}"), names_t)
        )
    built = _decision_tree_build_multi(prep, "__l0", specs, bins, depth)
    # ONE-PASS vote routing (r14 — VERDICT r13 #2): the model is
    # driver-side literals after r13, so each tree's test routing is a
    # literal CASE expression (_tree_route_predict) instead of the
    # per-level broadcast-join chain — ONE scan of the shared test fold
    # computes every tree's vote column, the per-tree accuracies AND
    # the majority vote in a single aggregate. Arithmetic identical:
    # per-tree accuracy = round(avg(vote == y), 6) over the same rows;
    # the majority = (2·Σ votes >= n_trees) replicates the old
    # (2·sum >= count) per-key combine because ``__k`` is row-unique
    # (the documented contract), so every key held exactly n_trees
    # votes; n_train per tree is the collected root count (exact int).
    vote_cols = []
    for t in range(n_trees):
        vote_cols.append(
            _tree_route_predict(names_by_tree[t], bins, built[t][1])
            .alias(f"__v_{t}")
        )
    scored = test.select("__y", *vote_cols)
    vote_sum = None
    for t in range(n_trees):
        vote_sum = (
            F.col(f"__v_{t}") if vote_sum is None
            else vote_sum + F.col(f"__v_{t}")
        )
    maj = F.when(vote_sum * 2 >= F.lit(n_trees), F.lit(1)).otherwise(
        F.lit(0)
    )
    agg = scored.agg(
        F.count("*").alias("__nt"),
        *[
            F.round(
                F.avg((F.col(f"__v_{t}") == F.col("__y")).cast("double")),
                6,
            ).alias(f"__acc_{t}")
            for t in range(n_trees)
        ],
        F.round(
            F.avg((maj == F.col("__y")).cast("double")), 6
        ).alias("__acc_forest"),
    )
    stack_rows = []
    for t in range(n_trees):
        n_train_t = int(built[t][1]["n_nodes"].get(1, 0))
        stack_rows.append(
            f"'{t}', CAST({n_train_t} AS BIGINT), "
            f"CAST(__nt AS BIGINT), __acc_{t}"
        )
    stack_rows.append(
        "'forest', CAST(NULL AS BIGINT), CAST(__nt AS BIGINT), __acc_forest"
    )
    return agg.select(
        F.expr(
            f"stack({n_trees + 1}, " + ", ".join(stack_rows) + ")"
        ).alias("member", "n_train", "n_test", "accuracy")
    ).select("member", "n_train", "n_test", "accuracy")


def _rf_tree_votes_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    feats_t: list[tuple[str, str]],
    id_sql: str,
    test_pred_sql: str,
    keep_sql: str,
    bins: int,
    depth: int,
) -> str:
    """One tree's key-preserving holdout votes as a standalone query:
    the tree CTEs over the md5-subsampled train fold, then the test fold
    (null-guarded over ALL features so every tree sees the same rows)
    binned with the tree's train stats and routed through the winner
    joins. Returns rows (k, y, v)."""
    names_t = [n for n, _ in feats_t]
    ctes, body = _tree_oracle_parts(
        f"(SELECT * FROM {table} WHERE NOT ({test_pred_sql}) "
        f"AND {keep_sql})",
        label_sql, feats_t, bins, depth,
    )
    ctes.append(
        f"""tree AS MATERIALIZED (
      SELECT node,
             CAST(CASE WHEN pos * 2 >= n THEN 1 ELSE 0 END AS BIGINT)
               AS predict
      FROM ({body}) t)"""
    )
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in feats_t
    )
    null_guard = " AND ".join(
        [f"({label_sql}) IS NOT NULL"]
        + [f"({e}) IS NOT NULL" for _, e in features_sql]
    )
    bin_sel = ", ".join(
        f"CASE WHEN w_{n} = 0 THEN 0 ELSE least({bins - 1}, greatest(0, "
        f"CAST(floor(({n} - mn_{n}) / w_{n}) AS INT))) END AS b_{n}"
        for n in names_t
    )
    bcols = ", ".join(f"b_{n}" for n in names_t)
    case_bin = (
        "CASE w.f "
        + " ".join(f"WHEN '{n}' THEN a.b_{n}" for n in names_t)
        + " END"
    )
    ctes.append(
        f"""tb0 AS MATERIALIZED (
      SELECT k, y, {bin_sel}, CAST(1 AS BIGINT) AS node FROM (
        SELECT {id_sql} AS k, CAST({label_sql} AS BIGINT) AS y, {feat_sel}
        FROM {table} WHERE ({test_pred_sql}) AND {null_guard}) q
      CROSS JOIN stw)"""
    )
    for lvl in range(depth):
        ctes.append(
            f"""tb{lvl + 1} AS MATERIALIZED (
      SELECT a.k, a.y, {bcols},
             CASE WHEN w.node IS NULL THEN a.node
                  ELSE a.node * 2 + CASE WHEN {case_bin} <= w.bin
                                         THEN 0 ELSE 1 END
             END AS node
      FROM tb{lvl} a LEFT JOIN w{lvl} w ON w.node = a.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT a.k, a.y, t.predict AS v
    FROM tb{depth} a JOIN tree t ON t.node = a.node"""
    )


def random_forest_holdout_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    id_sql: str,
    test_pred_sql: str,
    n_trees: int = 5,
    row_keep: int = 12,
    bins: int = 16,
    depth: int = 2,
    features_per_tree: int | None = None,
) -> str:
    """DuckDB replica of ``random_forest_holdout`` — per-tree vote
    queries unioned with their member id, per-member accuracy rows
    (n_train = the tree's null-guarded subsample count, which equals
    the engine's root-node n), and the identical ties-to-1 majority
    vote for the forest row."""
    names = [n for n, _ in features_sql]
    m = _rf_m(len(names), features_per_tree)
    vote_parts = []
    ntr_parts = []
    for t in range(n_trees):
        keep_names = set(_rf_feature_subset(names, t, m))
        feats_t = [(n, e) for n, e in features_sql if n in keep_names]
        keep = _rf_keep_sql(id_sql, t, row_keep)
        votes = _rf_tree_votes_sql(
            table, label_sql, features_sql, feats_t, id_sql,
            test_pred_sql, keep, bins, depth,
        )
        vote_parts.append(
            f"SELECT '{t}' AS member, k, y, v FROM (\n{votes}\n) rfv{t}"
        )
        tree_guard = " AND ".join(
            [f"({label_sql}) IS NOT NULL"]
            + [f"({e}) IS NOT NULL" for _, e in feats_t]
        )
        ntr_parts.append(
            f"""SELECT '{t}' AS member, count(*) AS n_train
      FROM {table} WHERE NOT ({test_pred_sql}) AND {keep}
        AND {tree_guard}"""
        )
    votes_all = "\n      UNION ALL ".join(vote_parts)
    ntr_all = "\n      UNION ALL ".join(ntr_parts)
    return f"""WITH votes AS MATERIALIZED (
      {votes_all}),
    ntr AS MATERIALIZED (
      {ntr_all}),
    pertree AS (
      SELECT v.member,
             CAST(n.n_train AS BIGINT) AS n_train,
             CAST(count(*) AS BIGINT) AS n_test,
             round(avg(CASE WHEN v.v = v.y THEN 1.0 ELSE 0.0 END), 6)
               AS accuracy
      FROM votes v JOIN ntr n ON n.member = v.member
      GROUP BY v.member, n.n_train),
    maj AS (
      SELECT k, y,
             CASE WHEN 2 * sum(v) >= count(*) THEN 1 ELSE 0 END AS mv
      FROM votes GROUP BY k, y)
    SELECT member, n_train, n_test, accuracy FROM pertree
    UNION ALL
    SELECT 'forest', CAST(NULL AS BIGINT), CAST(count(*) AS BIGINT),
           round(avg(CASE WHEN mv = y THEN 1.0 ELSE 0.0 END), 6)
    FROM maj"""


def feature_importance(model: DataFrame) -> DataFrame:
    """Split-gain feature importance over a fitted tree or forest MODEL
    frame (the output of ``decision_tree_train`` /
    ``random_forest_train``): each split node's Gini gain is its own
    impurity minus the size-weighted impurity of its two children
    (nodes 2·node and 2·node+1, which the histogram builder always
    emits with their n/pos), rounded to 9 dp; per feature the output is
    (feature, n_splits, total_gain) with the sum rounded to 6 dp —
    the standard GBDT importance report.

    Pure MODEL-frame arithmetic: two self-joins and one aggregate over
    the nodes·trees-sized frame — nothing here ever touches data-scale
    rows, so it costs the same at any corpus size."""
    has_tree = "tree" in model.columns
    m = model if has_tree else model.select(
        F.lit(0).cast("long").alias("tree"), "*"
    )
    splits = m.filter(F.col("kind") == "split").select(
        F.col("tree").alias("__t"), F.col("node").alias("__n"),
        "feature", F.col("n").alias("__pn"), F.col("pos").alias("__pp"),
    )
    kids = m.select(
        F.col("tree").alias("__kt"), F.col("node").alias("__kn"),
        F.col("n").alias("__cn"), F.col("pos").alias("__cp"),
    )

    def imp(n, p):
        return F.lit(2.0) * p * (n - p) / n / n

    left = kids.withColumnsRenamed(
        {"__cn": "__ln", "__cp": "__lp"}
    )
    right = kids.withColumnsRenamed(
        {"__kt": "__rt", "__kn": "__rn", "__cn": "__rn2", "__cp": "__rp"}
    )
    j = (
        splits.join(
            left,
            (left["__kt"] == splits["__t"])
            & (left["__kn"] == splits["__n"] * 2),
        )
        .join(
            right,
            (right["__rt"] == splits["__t"])
            & (right["__rn"] == splits["__n"] * 2 + 1),
        )
        .select(
            "feature",
            F.round(
                imp(F.col("__pn"), F.col("__pp"))
                - (F.col("__ln") / F.col("__pn"))
                * imp(F.col("__ln"), F.col("__lp"))
                - (F.col("__rn2") / F.col("__pn"))
                * imp(F.col("__rn2"), F.col("__rp")),
                9,
            ).alias("__gain"),
        )
    )
    return j.groupBy("feature").agg(
        F.count("*").cast("long").alias("n_splits"),
        F.round(F.sum("__gain"), 6).alias("total_gain"),
    )


def feature_importance_oracle_sql(model_sql: str,
                                  has_tree: bool = True) -> str:
    """DuckDB replica of ``feature_importance`` over a model query
    (e.g. the output of ``random_forest_oracle_sql`` or
    ``decision_tree_oracle_sql``) — identical join and arithmetic."""
    tree_col = "tree" if has_tree else "CAST(0 AS BIGINT) AS tree"
    sel = "*" if has_tree else f"{tree_col}, *"
    return f"""WITH model AS MATERIALIZED (
      SELECT {sel} FROM (
      {model_sql}
      ) mq),
    s AS (SELECT tree, node, feature, n, pos FROM model
          WHERE kind = 'split'),
    c AS (SELECT tree, node, n, pos FROM model)
    SELECT s.feature,
           CAST(count(*) AS BIGINT) AS n_splits,
           round(sum(round(
             2.0 * s.pos * (s.n - s.pos) / s.n / s.n
             - (CAST(l.n AS DOUBLE) / s.n)
               * (2.0 * l.pos * (l.n - l.pos) / l.n / l.n)
             - (CAST(r.n AS DOUBLE) / s.n)
               * (2.0 * r.pos * (r.n - r.pos) / r.n / r.n), 9)), 6)
             AS total_gain
    FROM s
    JOIN c l ON l.tree = s.tree AND l.node = s.node * 2
    JOIN c r ON r.tree = s.tree AND r.node = s.node * 2 + 1
    GROUP BY s.feature"""


def mutual_information(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    bins: int = 16,
) -> DataFrame:
    """Mutual information I(label; binned feature) in nats per feature —
    the model-free supervised ranking beside chi2 (text.chi2_features)
    and the split-gain importance: each feature is equi-width binned
    over [min, max] (the histogram-tree discipline: one stats pass
    broadcast back, constant features land in bin 0 and score 0), one
    codegen scan builds the (feature, bin, label) cell counts, and
    MI = Σ (c/N)·ln(c·N / (c_bin·c_label)) over observed cells — absent
    cells contribute 0 by the 0·ln0 convention, which the groupBy
    realizes for free. Rows with a null label or any null feature are
    dropped (the shared trainer contract, so rankings are comparable
    across the classify family).

    Returns (feature, mi) with mi rounded to 6 dp.

    Scale shape: one stats aggregate + ONE data-scale scan into at most
    F·bins·2 cells (map-side combined); everything after is arithmetic
    over the model-sized cell frame."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    names = [n for n, _ in features]
    raw = (
        ensure_parallelism(df)
        .select(
            label.cast("bigint").alias("__y"),
            *[expr.cast("double").alias(n) for n, expr in features],
        )
        .na.drop(subset=["__y", *names])
    )
    st = raw.agg(
        *[F.min(n).alias(f"__mn_{n}") for n in names],
        *[F.max(n).alias(f"__mx_{n}") for n in names],
    ).select(
        "*",
        *[
            ((F.col(f"__mx_{n}") - F.col(f"__mn_{n}")) / F.lit(float(bins)))
            .alias(f"__w_{n}")
            for n in names
        ],
    )
    binned = raw.crossJoin(F.broadcast(st)).select(
        "__y",
        *[
            F.when(F.col(f"__w_{n}") == 0, F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col(n) - F.col(f"__mn_{n}"))
                            / F.col(f"__w_{n}")
                        ).cast("int"),
                    ),
                )
            )
            .cast("int")
            .alias(f"__b_{n}")
            for n in names
        ],
    )
    stack_expr = "stack({}, {})".format(
        len(names), ", ".join(f"'{n}', __b_{n}" for n in names)
    )
    cells = (
        binned.select("__y", F.expr(stack_expr).alias("__f", "__bin"))
        .groupBy("__f", "__bin", "__y")
        .agg(F.count("*").alias("__c"))
        .localCheckpoint(eager=False)
    )
    cb = cells.groupBy("__f", "__bin").agg(F.sum("__c").alias("__cb"))
    cy = cells.groupBy("__f", "__y").agg(F.sum("__c").alias("__cy"))
    nn = cells.groupBy("__f").agg(F.sum("__c").alias("__n"))
    return (
        cells.join(cb, ["__f", "__bin"])
        .join(cy, ["__f", "__y"])
        .join(nn, ["__f"])
        .groupBy("__f")
        .agg(
            F.round(
                F.sum(
                    F.col("__c")
                    * F.log(
                        F.col("__c").cast("double") * F.col("__n")
                        / (F.col("__cb").cast("double") * F.col("__cy"))
                    )
                )
                / F.first("__n"),
                6,
            ).alias("mi")
        )
        .select(F.col("__f").alias("feature"), "mi")
    )


def mutual_information_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    bins: int = 16,
) -> str:
    """DuckDB replica of ``mutual_information`` — identical binning
    CTEs (the tree-oracle pattern), cell counts, marginals, and the
    observed-cells MI sum."""
    names = [n for n, _ in features_sql]
    feat_sel = ", ".join(
        f"CAST({e} AS DOUBLE) AS {n}" for n, e in features_sql
    )
    null_guard = " AND ".join(
        [f"({label_sql}) IS NOT NULL"]
        + [f"({e}) IS NOT NULL" for _, e in features_sql]
    )
    st_sel = ", ".join(
        f"min({n}) AS mn_{n}, max({n}) AS mx_{n}" for n in names
    )
    w_sel = ", ".join(
        f"(mx_{n} - mn_{n}) / {float(bins)!r} AS w_{n}" for n in names
    )
    bin_sel = ", ".join(
        f"CASE WHEN w_{n} = 0 THEN 0 ELSE least({bins - 1}, greatest(0, "
        f"CAST(floor(({n} - mn_{n}) / w_{n}) AS INT))) END AS b_{n}"
        for n in names
    )
    unpivot = "\n      UNION ALL ".join(
        f"SELECT '{n}' AS f, b_{n} AS bin, y FROM b0" for n in names
    )
    return f"""WITH raw AS MATERIALIZED (
      SELECT CAST({label_sql} AS BIGINT) AS y, {feat_sel}
      FROM {table} WHERE {null_guard}),
    st AS MATERIALIZED (SELECT {st_sel} FROM raw),
    stw AS MATERIALIZED (SELECT *, {w_sel} FROM st),
    b0 AS MATERIALIZED (
      SELECT y, {bin_sel} FROM raw CROSS JOIN stw),
    cells AS MATERIALIZED (
      SELECT f, bin, y, count(*) AS c FROM (
      {unpivot}) u GROUP BY f, bin, y),
    cb AS (SELECT f, bin, sum(c) AS cb FROM cells GROUP BY f, bin),
    cy AS (SELECT f, y, sum(c) AS cy FROM cells GROUP BY f, y),
    nn AS (SELECT f, sum(c) AS n FROM cells GROUP BY f)
    SELECT cells.f AS feature,
           round(sum(cells.c * ln(CAST(cells.c AS DOUBLE) * nn.n
                                  / (CAST(cb.cb AS DOUBLE) * cy.cy)))
                 / any_value(nn.n), 6) AS mi
    FROM cells
    JOIN cb ON cb.f = cells.f AND cb.bin = cells.bin
    JOIN cy ON cy.f = cells.f AND cy.y = cells.y
    JOIN nn ON nn.f = cells.f
    GROUP BY cells.f"""


def logreg_learning_curve(
    df: DataFrame,
    label: Column,
    features: list[tuple[str, Column]],
    id_expr: Column,
    test_pred: Column,
    train_sixteenths: tuple[int, ...] = (4, 8, 12, 16),
    iterations: int = 8,
    lr: float = 0.5,
) -> DataFrame:
    """LEARNING CURVE for the logistic quality classifier: held-out
    accuracy/AUC as the train set grows — the diagnostic that says
    whether more data or a better model is the next move (flat curve =
    model-limited, rising = data-limited). Each point k ∈
    ``train_sixteenths`` reuses ``logreg_holdout_eval`` VERBATIM on the
    input filtered to (test fold) ∪ (train rows whose md5 digit of
    '<id>:lc' is < k of 16) — the ':lc' salt keeps the growth nests
    independent of the fold split, and nesting is monotone: each
    point's train rows contain the previous point's. The test fold is
    identical at every point.

    Returns one row per point: (train_sixteenths, n_train, n_test,
    accuracy, auc).

    Scale shape: |points| independent holdout evaluations, each the
    shared GD fit + one scoring scan over its slice — the CV cost
    model with nested rather than disjoint slices."""
    if not train_sixteenths:
        raise ValueError("train_sixteenths must be non-empty")
    if any(not (1 <= k <= 16) for k in train_sixteenths):
        raise ValueError("train_sixteenths values must be in [1, 16]")
    digit = F.conv(
        F.substring(F.md5(F.concat(id_expr, F.lit(":lc"))), 1, 1), 16, 10
    ).cast("int")
    # evaluate the growth digit, fold predicate, label and features
    # ONCE, cached (r13): each curve point's holdout otherwise re-runs
    # the string-heavy feature expressions over a fresh source scan
    prep = ensure_parallelism(df).select(
        digit.alias("__lcd"),
        test_pred.alias("__lct"),
        label.cast("double").alias("__lcl"),
        *[e.cast("double").alias(n) for n, e in features],
    ).persist()
    prep.count()  # materialize once before the fused fit rounds
    names = [n for n, _ in features]
    # FUSED multi-point fit + eval (r14 — VERDICT r13 #3, the
    # logreg_kfold_cv shape): every curve point's train fold is a
    # conditional slice of the SAME cached frame (test ∪ nested md5
    # growth slice, train = ¬test ∧ digit < k), so one
    # conditional-aggregate scan per round fits every point, and —
    # because all points share the identical test fold — the per-point
    # scores stack into one fold-partitioned AUC histogram. Arithmetic
    # identical to the per-point logreg_holdout_eval (see
    # _logreg_fit_multi / logreg_kfold_cv).
    pts = list(train_sixteenths)
    train_conds = [
        (~F.col("__lct")) & (F.col("__lcd") < F.lit(kk)) for kk in pts
    ]
    models = _logreg_fit_multi(
        prep, "__lcl", names, train_conds, iterations, lr
    )
    margins = [_logreg_margin_lit(models[i], names) for i in range(len(pts))]
    test_c = F.col("__lct")
    agg_exprs = []
    for i, kk in enumerate(pts):
        agg_exprs.append(
            F.count(F.when(train_conds[i], F.lit(1))).alias(f"__ntr_{i}")
        )
        agg_exprs.append(
            F.count(F.when(test_c, F.lit(1))).alias(f"__nt_{i}")
        )
        agg_exprs.append(
            F.round(
                F.avg(
                    F.when(
                        test_c,
                        F.when(
                            (F.round(margins[i], 6) >= 0)
                            == (F.col("__lcl") == 1.0),
                            F.lit(1.0),
                        ).otherwise(F.lit(0.0)),
                    )
                ),
                6,
            ).alias(f"__acc_{i}")
        )
    arow = prep.agg(*agg_exprs)
    # the test fold is IDENTICAL at every point, so each test row feeds
    # every point's score histogram: stack one (point, y, p_point)
    # tuple per point per test row
    scored = prep.filter(test_c).select(
        F.col("__lcl").alias("__y"),
        *[
            F.lit(int(kk)).alias(f"__pt_{i}")
            for i, kk in enumerate(pts)
        ],
        *[
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margins[i])), 6)
            .alias(f"__pp_{i}")
            for i in range(len(pts))
        ],
    ).select(
        "__y",
        F.expr(
            "stack({}, {})".format(
                len(pts),
                ", ".join(
                    f"__pt_{i}, __pp_{i}" for i in range(len(pts))
                ),
            )
        ).alias("__point", "__p"),
    )
    hist = scored.groupBy("__point", "__p").agg(
        F.sum("__y").cast("long").alias("__pos"),
        (F.count("*") - F.sum("__y")).cast("long").alias("__neg"),
    )
    win = (
        Window.partitionBy("__point").orderBy("__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    contrib = hist.select(
        "__point", "__pos", "__neg",
        (F.sum("__neg").over(win) - F.col("__neg")).alias("__nb"),
    ).select(
        "__point", "__pos", "__neg",
        (
            F.col("__nb") * F.col("__pos")
            + F.col("__pos") * F.col("__neg") / F.lit(2.0)
        ).alias("__u"),
    )
    aucp = contrib.groupBy("__point").agg(
        F.sum("__pos").alias("__P"),
        F.sum("__neg").alias("__N"),
        F.sum("__u").alias("__U"),
    )
    stacked = arow.select(
        F.expr(
            f"stack({len(pts)}, " + ", ".join(
                f"CAST({int(kk)} AS BIGINT), __ntr_{i}, __nt_{i}, __acc_{i}"
                for i, kk in enumerate(pts)
            ) + ")"
        ).alias("train_sixteenths", "__n_train", "__n_test", "__accuracy")
    )
    return (
        stacked.join(
            aucp, stacked["train_sixteenths"] == aucp["__point"], "left"
        )
        .select(
            "train_sixteenths",
            F.col("__n_train").cast("long").alias("n_train"),
            F.col("__n_test").cast("long").alias("n_test"),
            F.col("__accuracy").alias("accuracy"),
            F.when(
                (F.col("__P") > 0) & (F.col("__N") > 0),
                F.round(F.col("__U") / (F.col("__P") * F.col("__N")), 6),
            ).alias("auc"),
        )
    )


def logreg_learning_curve_oracle_sql(
    table: str,
    label_sql: str,
    features_sql: list[tuple[str, str]],
    id_sql: str,
    test_pred_sql: str,
    train_sixteenths: tuple[int, ...] = (4, 8, 12, 16),
    iterations: int = 8,
    lr: float = 0.5,
) -> str:
    """DuckDB replica of ``logreg_learning_curve`` — each point's
    holdout WITH-chain over the identically filtered table, unioned."""
    parts = []
    for k in train_sixteenths:
        filt = (
            f"(SELECT * FROM {table} WHERE ({test_pred_sql}) OR "
            f"(instr('0123456789abcdef', substr(md5(({id_sql}) || "
            f"':lc'), 1, 1)) - 1) < {k})"
        )
        inner = logreg_holdout_oracle_sql(
            filt, label_sql, features_sql, test_pred_sql, iterations, lr
        )
        parts.append(
            f"""SELECT CAST({k} AS BIGINT) AS train_sixteenths,
      n_train, n_test, test_accuracy AS accuracy, test_auc AS auc
      FROM (\n{inner}\n) lc{k}"""
        )
    return "\nUNION ALL\n".join(parts)

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

from census_data_pipeline_spark.sources.catalog import ensure_parallelism


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
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    names = [n for n, _ in features]
    raw = ensure_parallelism(df).select(
        label.cast("double").alias("__y"),
        *[expr.cast("double").alias(n) for n, expr in features],
    )
    st = raw.agg(
        *[F.round(F.avg(n), 6).alias(f"__m_{n}") for n in names],
        *[F.round(F.stddev_pop(n), 6).alias(f"__s_{n}") for n in names],
    )
    z = (
        raw.crossJoin(F.broadcast(st))
        .select(
            "__y",
            *[
                F.round(
                    (F.col(n) - F.col(f"__m_{n}")) / F.col(f"__s_{n}"), 6
                ).alias(n)
                for n in names
            ],
        )
        .localCheckpoint(eager=False)
    )
    spark = df.sparkSession
    w = spark.range(1).select(
        F.lit(0.0).alias("__b"),
        *[F.lit(0.0).alias(f"__w_{n}") for n in names],
    )
    margin = lambda: (  # noqa: E731 — rebuilt per round against fresh cols
        F.col("__b")
        + sum((F.col(f"__w_{n}") * F.col(n) for n in names), F.lit(0.0))
    )
    for _ in range(iterations):
        scored = z.crossJoin(F.broadcast(w)).withColumn(
            "__r", F.lit(1.0) / (F.lit(1.0) + F.exp(-margin())) - F.col("__y")
        )
        g = scored.agg(
            F.round(F.avg("__r"), 6).alias("__gb"),
            *[
                F.round(F.avg(F.col("__r") * F.col(n)), 6).alias(f"__g_{n}")
                for n in names
            ],
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                F.round(F.col("__b") - F.lit(lr) * F.col("__gb"), 6)
                .alias("__b"),
                *[
                    F.round(
                        F.col(f"__w_{n}") - F.lit(lr) * F.col(f"__g_{n}"), 6
                    ).alias(f"__w_{n}")
                    for n in names
                ],
            )
            .localCheckpoint(eager=False)
        )
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

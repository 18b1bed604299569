"""Distributed 2-D skyline (Pareto front) — multi-criteria optimality,
the "best price for the size" query a catalog or model-selection surface
runs (SURVEY.md §2.11 ⊕ analytics tier).

A row p dominates q iff p is >= q on both criteria and strictly better
on at least one; the skyline is the non-dominated set. The naive form is
a quadratic NOT EXISTS self-join; the 2-D sorted-scan form is a single
ordered pass ("keep the row iff its y beats every y at strictly larger
x") — but that pass is an UNPARTITIONED window, the serialization this
engine bans at data scale (SCALING.md 'Skew'). So this operator runs the
two-phase decomposition the prefix-sum family uses
(``operators/prefixsum.py``):

1. collapse to the distinct-x frame (x, max-y) — group-by, one shuffle;
2. range-bucket x deterministically; suffix-max WITHIN each bucket via a
   bucket-partitioned (warning-free, parallel) window;
3. suffix-max ACROSS buckets over the n_buckets-row totals frame via a
   triangular self-join (no unpartitioned window even on the tiny
   frame — same rationale as prefixsum.py), broadcast back.

M1(x) = max{ y' : x' > x } then decides dominance: a row survives iff it
attains its own x's max y (rows below their x-group max are dominated at
equal x) and M1(x) < y (nothing strictly right beats it). Exact for
ties: identical (x, y) duplicates dominate each other non-strictly, so
both survive — matching the ANSI NOT-EXISTS definition an oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    maximize_x: bool = True,
    maximize_y: bool = True,
    n_buckets: int = 32,
) -> DataFrame:
    """Rows of ``df`` on the Pareto front of (x_col, y_col). Direction
    per criterion via ``maximize_x`` / ``maximize_y`` (False =
    minimize). Null criteria rows are excluded (null is not comparable
    under dominance)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    sx = F.col(x_col) if maximize_x else -F.col(x_col)
    sy = F.col(y_col) if maximize_y else -F.col(y_col)
    base = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .withColumn("__x", sx.cast("double"))
        .withColumn("__y", sy.cast("double"))
    )

    # distinct-x frame: one row per x with the best y at that x
    xs = base.groupBy("__x").agg(F.max("__y").alias("__ymax"))

    # deterministic range bucketing of x (order-preserving: higher
    # bucket <=> larger x), same floor construction as prefixsum.py
    bounds = xs.agg(F.min("__x").alias("__lo"), F.max("__x").alias("__hi"))
    span = (F.col("__hi") - F.col("__lo")).cast("double")
    bucket = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("__x") - F.col("__lo")) / span * n_buckets),
        )
    ).cast("long")
    bucketed = (
        xs.crossJoin(F.broadcast(bounds))
        .withColumn("__bkt", bucket)
        .drop("__lo", "__hi")
    )

    # phase 1: suffix max of __ymax within each bucket, EXCLUSIVE of the
    # row's own x (strictly-larger-x semantics)
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(F.col("__x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("__sfx_local", F.max("__ymax").over(w_in))

    # phase 2: exclusive suffix max of bucket maxima (n_buckets rows) via
    # a triangular self-join — strictly higher buckets only
    totals = bucketed.groupBy("__bkt").agg(F.max("__ymax").alias("__btot"))
    t1, t2 = totals.alias("t1"), totals.alias("t2")
    offsets = (
        t1.join(t2, F.col("t2.__bkt") > F.col("t1.__bkt"), "left")
        .groupBy(F.col("t1.__bkt").alias("__bkt"))
        .agg(F.max("t2.__btot").alias("__sfx_hi"))
    )

    m1 = (
        local.join(F.broadcast(offsets), "__bkt")
        .select(
            "__x",
            "__ymax",
            F.greatest(
                F.coalesce("__sfx_local", F.lit(float("-inf"))),
                F.coalesce("__sfx_hi", F.lit(float("-inf"))),
            ).alias("__m1"),
        )
    )

    # survive iff this row attains its x's best y AND nothing strictly
    # to the right reaches it. No broadcast hint: the distinct-x frame is
    # data-scale for continuous x (AQE broadcasts when it is small — the
    # minhash_lsh_pairs lesson, VERDICT r3).
    return (
        base.join(m1, "__x")
        .filter((F.col("__y") == F.col("__ymax")) & (F.col("__m1") < F.col("__y")))
        .drop("__x", "__y", "__ymax", "__m1")
    )

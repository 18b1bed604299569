"""Two-phase parallel prefix sum — the scale rewrite for ordered windows
on hot groups.

``sum(x) OVER (PARTITION BY g ORDER BY o)`` funnels each group through a
single task, so one 10⁹-row group serializes the stage (SCALING.md
'Skew' #4). The classic fix decomposes the running sum:

1. bucket the order key into ``n_buckets`` contiguous ranges per group
   (``ntile``-free: hash-independent ``floor`` over the order key's
   min/max, so bucketing is deterministic and order-preserving),
2. cumsum WITHIN each (group, bucket) — parallel windows over small
   partitions,
3. cumsum the per-bucket totals ACROSS buckets — a window over
   n_buckets rows per group (tiny) — and broadcast-join the exclusive
   bucket offset back.

The result is bit-identical to the direct window for associative sums of
integers (property-tested in tests/test_operators.py); wall-clock scales
with the widest bucket instead of the widest group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_sum_scalable(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    output_col: str = "running_sum",
    n_buckets: int = 32,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` over ``order_col`` within
    each group, computed with the two-phase decomposition above.
    ``order_col`` must be numeric and unique per group (the same contract
    the direct window form requires for a deterministic result)."""
    groups = list(group_cols or [])

    # deterministic range bucketing of the order key per group
    bounds = df.groupBy(*groups).agg(
        F.min(order_col).alias("__lo"), F.max(order_col).alias("__hi")
    )
    with_b = df.join(F.broadcast(bounds), on=groups) if groups else df.crossJoin(
        F.broadcast(bounds)
    )
    span = (F.col("__hi") - F.col("__lo") + 1).cast("double")
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(order_col) - F.col("__lo")) / span * n_buckets),
    ).cast("long")
    bucketed = with_b.withColumn("__bkt", bucket).drop("__lo", "__hi")

    # phase 1: parallel cumsum within (group, bucket)
    w_in = Window.partitionBy(*groups, "__bkt").orderBy(order_col)
    local = bucketed.withColumn("__local", F.sum(value_col).over(w_in))

    # phase 2: exclusive prefix of bucket totals (n_buckets rows per group)
    totals = bucketed.groupBy(*groups, "__bkt").agg(
        F.sum(value_col).alias("__tot")
    )
    # The totals frame holds at most n_buckets rows per group. With groups
    # the exclusive prefix is a partitioned (warning-free) window; without
    # groups an unpartitioned window would log Spark's "No Partition
    # Defined" warning on every run (a constant partition key doesn't
    # help — Spark 4's EliminateWindowPartitions folds it away), and a
    # noisy benign warning would let a REAL data-scale unpartitioned
    # window hide in the logs. So the ungrouped case uses a triangular
    # self-join instead: O(n_buckets²) ≤ 64² rows, no window at all.
    # Join+sum reorders the additions, which is exact for the integer
    # sums this operator contracts for (see module docstring).
    if groups:
        w_bkt = Window.partitionBy(*groups).orderBy("__bkt")
        offsets = totals.withColumn(
            "__off",
            F.coalesce(
                F.sum("__tot").over(
                    w_bkt.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        ).select(*groups, "__bkt", "__off")
    else:
        t1, t2 = totals.alias("t1"), totals.alias("t2")
        offsets = (
            t1.join(t2, F.col("t2.__bkt") < F.col("t1.__bkt"), "left")
            .groupBy(F.col("t1.__bkt").alias("__bkt"))
            .agg(F.coalesce(F.sum("t2.__tot"), F.lit(0)).alias("__off"))
        )

    joined = local.join(F.broadcast(offsets), on=[*groups, "__bkt"])
    return (
        joined.withColumn(output_col, F.col("__local") + F.col("__off"))
        .drop("__bkt", "__local", "__off")
    )


def running_sums_scalable(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    output_cols: list[str],
    group_cols: list[str] | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Multi-column sibling of ``running_sum_scalable``: N inclusive
    running sums over ONE ordering in a SINGLE two-phase pass — one
    bounds broadcast, one in-bucket window computing every column, one
    totals aggregate, one offset join. A caller that needs several
    CDFs over the same axis (``drift.wasserstein_1`` needs both
    samples' cumulative counts plus a rank) pays the bucketing
    machinery once instead of chaining N single-column passes (3×
    fewer shuffles and window phases; measured 9.3 s → ~3 s on the W1
    headline query at sf0.1). Same contract: numeric unique
    ``order_col`` per group, integer-sum exactness."""
    if len(value_cols) != len(output_cols) or not value_cols:
        raise ValueError("value_cols and output_cols must align")
    groups = list(group_cols or [])

    bounds = df.groupBy(*groups).agg(
        F.min(order_col).alias("__lo"), F.max(order_col).alias("__hi")
    )
    with_b = df.join(F.broadcast(bounds), on=groups) if groups else (
        df.crossJoin(F.broadcast(bounds))
    )
    span = (F.col("__hi") - F.col("__lo") + 1).cast("double")
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(order_col) - F.col("__lo")) / span * n_buckets),
    ).cast("long")
    bucketed = with_b.withColumn("__bkt", bucket).drop("__lo", "__hi")

    w_in = Window.partitionBy(*groups, "__bkt").orderBy(order_col)
    local = bucketed
    for vc, oc in zip(value_cols, output_cols):
        local = local.withColumn(f"__loc_{oc}", F.sum(vc).over(w_in))

    totals = bucketed.groupBy(*groups, "__bkt").agg(
        *[F.sum(vc).alias(f"__tot_{oc}")
          for vc, oc in zip(value_cols, output_cols)]
    )
    if groups:
        w_bkt = Window.partitionBy(*groups).orderBy("__bkt")
        offsets = totals.select(
            *groups, "__bkt",
            *[
                F.coalesce(
                    F.sum(f"__tot_{oc}").over(
                        w_bkt.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ).alias(f"__off_{oc}")
                for oc in output_cols
            ],
        )
    else:
        t1, t2 = totals.alias("t1"), totals.alias("t2")
        offsets = (
            t1.join(t2, F.col("t2.__bkt") < F.col("t1.__bkt"), "left")
            .groupBy(F.col("t1.__bkt").alias("__bkt"))
            .agg(*[
                F.coalesce(F.sum(f"t2.__tot_{oc}"), F.lit(0))
                .alias(f"__off_{oc}")
                for oc in output_cols
            ])
        )

    joined = local.join(F.broadcast(offsets), on=[*groups, "__bkt"])
    for oc in output_cols:
        joined = joined.withColumn(
            oc, F.col(f"__loc_{oc}") + F.col(f"__off_{oc}")
        ).drop(f"__loc_{oc}", f"__off_{oc}")
    return joined.drop("__bkt")

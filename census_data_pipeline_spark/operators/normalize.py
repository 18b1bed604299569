"""Column normalization (reference: src/transformers.py:152-188).

Methods: ``minmax`` (x-min)/(max-min), ``zscore`` (x-mean)/std (sample std,
ddof=1 — pandas default == Spark ``stddev``), ``robust`` (x-median)/IQR with
exact quantiles (transformers.py:184 uses pandas exact quantile).

Implementation choice for scale: the reference computes global scalars then
broadcasts them (pandas arithmetic). The naive Spark translation is
``Window.partitionBy()`` with no keys — which funnels 100 TB through ONE
task. Instead we compute the scalar stats with a regular (partial+final)
aggregate and ``crossJoin(broadcast(stats))`` — two narrow stages, no
single-partition bottleneck, identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NORMALIZE_METHODS = ("minmax", "zscore", "robust")


def normalize_column(
    df: DataFrame,
    column: str,
    method: str = "minmax",
    output_col: str | None = None,
) -> DataFrame:
    """Reference: ``DataTransformer.normalize_column``
    (src/transformers.py:152-188). Exact quantiles are used for oracle
    parity; at 100 TB swap ``F.percentile`` for ``F.percentile_approx``
    (documented trade-off, SURVEY.md §7.3)."""
    if method not in NORMALIZE_METHODS:
        raise ValueError(f"method must be one of {NORMALIZE_METHODS}")
    out = output_col or f"{column}_normalized"
    c = F.col(column)

    if method == "minmax":
        stats = df.agg(
            F.min(c).alias("__lo"), F.max(c).alias("__hi")
        )
        expr = (c - F.col("__lo")) / (F.col("__hi") - F.col("__lo"))
        drop = ["__lo", "__hi"]
    elif method == "zscore":
        stats = df.agg(
            F.avg(c).alias("__mu"), F.stddev(c).alias("__sigma")
        )
        expr = (c - F.col("__mu")) / F.col("__sigma")
        drop = ["__mu", "__sigma"]
    else:  # robust
        stats = df.agg(
            F.expr(f"percentile({column}, 0.5)").alias("__med"),
            F.expr(f"percentile({column}, 0.25)").alias("__q1"),
            F.expr(f"percentile({column}, 0.75)").alias("__q3"),
        )
        expr = (c - F.col("__med")) / (F.col("__q3") - F.col("__q1"))
        drop = ["__med", "__q1", "__q3"]

    return df.crossJoin(F.broadcast(stats)).withColumn(out, expr).drop(*drop)


def normalize_by_group(
    df: DataFrame,
    column: str,
    group_cols: list[str],
    method: str = "zscore",
    output_col: str | None = None,
) -> DataFrame:
    """Per-group normalization (the grouped variant of W1/W2): group stats
    via a hash aggregate joined back on the group key — one shuffle on the
    (arbitrarily-many) group keys, never a single-partition window. The
    equivalent SQL is a ``PARTITION BY`` window; this form scales when
    groups are numerous or skewed."""
    if method not in ("minmax", "zscore"):
        raise ValueError("grouped normalization supports minmax|zscore")
    out = output_col or f"{column}_normalized"
    c = F.col(column)
    if method == "minmax":
        stats = df.groupBy(*group_cols).agg(
            F.min(c).alias("__lo"), F.max(c).alias("__hi")
        )
        expr = (c - F.col("__lo")) / (F.col("__hi") - F.col("__lo"))
        drop = ["__lo", "__hi"]
    else:
        stats = df.groupBy(*group_cols).agg(
            F.avg(c).alias("__mu"), F.stddev(c).alias("__sigma")
        )
        expr = (c - F.col("__mu")) / F.col("__sigma")
        drop = ["__mu", "__sigma"]
    # null-safe join: NULL is a legitimate group key (a window PARTITION BY
    # keeps it, and groupBy computes stats for it) — a plain equi-join
    # would silently drop those rows
    cond = None
    for g in group_cols:
        c = df[g].eqNullSafe(stats[g])
        cond = c if cond is None else cond & c
    joined = df.join(stats, on=cond)
    for g in group_cols:
        joined = joined.drop(stats[g])
    return joined.withColumn(out, expr).drop(*drop)

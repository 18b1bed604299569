"""Robust outlier scoring — median/MAD per group (Iglewicz–Hoaglin
modified z-score), the quality-filter primitive that survives the
contamination it is hunting (mean/stddev z-scores are dragged by the
very outliers they should flag; median/MAD have a 50% breakdown point).

    z = 0.6745 · (x − median_g) / MAD_g,   MAD_g = median(|x − median_g|)

Scale shape: two grouped EXACT-median aggregations (Spark ≥ 3.4
``median`` — swap to ``percentile_approx`` at the 100 TB tier per the
sketch-rollup guidance in SCALING.md) with a broadcast-able per-group
stats frame joined back — group cardinality is the frame size, so the
data shuffles twice on the group key and never more. A zero MAD
(>= 50% of the group identical) yields NULL z / not-outlier rather than
a division blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 0.6745 ~ Φ⁻¹(0.75): makes MAD consistent with σ under normality, so
# the 3.5 default cut matches the Iglewicz–Hoaglin recommendation
_MAD_CONSISTENCY = 0.6745


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    cutoff: float = 3.5,
) -> DataFrame:
    """Input rows + ``robust_z`` (rounded to 6, NULL when MAD is 0) and
    ``is_outlier`` (|z| > cutoff; false when z is NULL)."""
    groups = list(group_cols or [])

    def regroup(frame, agg):
        return frame.groupBy(*groups).agg(agg) if groups else frame.agg(agg)

    def joinback(frame, stats):
        if groups:
            return frame.join(F.broadcast(stats), on=groups)
        return frame.crossJoin(F.broadcast(stats))

    med = regroup(df, F.median(value_col).alias("__med"))
    with_med = joinback(df, med)
    mad = regroup(
        with_med.select(
            *groups, F.abs(F.col(value_col) - F.col("__med")).alias("__ad")
        ),
        F.median("__ad").alias("__mad"),
    )
    z = F.when(
        F.col("__mad") != 0,
        F.round(
            F.lit(_MAD_CONSISTENCY)
            * (F.col(value_col) - F.col("__med")) / F.col("__mad"),
            6,
        ),
    )
    return (
        joinback(with_med, mad)
        .withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("robust_z")) > cutoff, F.lit(False)),
        )
        .drop("__med", "__mad")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    output_col: str = "winsorized",
) -> DataFrame:
    """Clamp ``value_col`` to its per-group [lower, upper] exact
    percentiles (linear interpolation — the quantile_cont convention) —
    the heavy-tail tamer applied before mean-based aggregates and model
    features. Bounds are rounded to 6 decimals BEFORE clamping so a
    clamped row carries a cross-engine-stable value while in-range rows
    keep their exact input. Same scale shape as ``robust_outliers``:
    one grouped percentile agg + a broadcast stats join; swap the exact
    percentile for ``percentile_approx`` at the sketch tier."""
    if not 0 <= lower < upper <= 1:
        raise ValueError("need 0 <= lower < upper <= 1")
    groups = list(group_cols or [])
    agg = [
        F.round(F.percentile(value_col, F.lit(lower)), 6).alias("__lo"),
        F.round(F.percentile(value_col, F.lit(upper)), 6).alias("__hi"),
    ]
    stats = df.groupBy(*groups).agg(*agg) if groups else df.agg(*agg)
    joined = (
        df.join(F.broadcast(stats), on=groups) if groups
        else df.crossJoin(F.broadcast(stats))
    )
    return joined.withColumn(
        output_col,
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
    ).drop("__lo", "__hi")

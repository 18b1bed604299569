"""Linear interpolation over ordered series (time-series prep).

The reference pipeline stops at zero-fill resampling (the engine's
``events_gapfill_1h``); real feature/training pipelines interpolate
missing points between observations. Semantics match pandas
``Series.interpolate(method='linear')`` defaults:

- a null BETWEEN two observations gets the linear value at its position,
- nulls AFTER the last observation carry it forward (constant tail),
- nulls BEFORE the first observation stay null.

Implementation is two windows per group (running last / upcoming first,
both ``ignorenulls``) plus pure arithmetic — one shuffle on the group
key, no UDFs, and the window frames are growing/shrinking (no
whole-partition buffering beyond Spark's standard window spill).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    output_col: str | None = None,
) -> DataFrame:
    """Fill nulls in ``value_col`` by linear interpolation along the
    numeric ``order_col`` within each group. ``order_col`` must be
    numeric (convert timestamps with ``unix_micros`` first) and unique
    per group."""
    out = output_col or value_col
    keys = [F.col(c) for c in (group_cols or [])]
    base = Window.partitionBy(*keys).orderBy(order_col)
    w_prev = base.rowsBetween(Window.unboundedPreceding, 0)
    w_next = base.rowsBetween(0, Window.unboundedFollowing)

    v, o = F.col(value_col), F.col(order_col)
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_o = F.last(F.when(v.isNotNull(), o), ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    next_o = F.first(F.when(v.isNotNull(), o), ignorenulls=True).over(w_next)

    frac: Column = (o - prev_o) / (next_o - prev_o)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), F.lit(None))          # before first obs
        .when(next_v.isNull(), prev_v)               # constant tail
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return df.withColumn(out, interp)

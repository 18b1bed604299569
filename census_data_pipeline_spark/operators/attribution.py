"""Marketing-touch attribution over the event stream: for every
conversion, find the FIRST and LAST qualifying touch inside a lookback
horizon and credit the conversion's value to that touch's channel —
the first-touch / last-touch models every growth-analytics stack runs.

Scale shape: conversions and touches are two filtered scans of the same
events table; the candidate join is user-keyed (equi-join on user_id)
with the lookback horizon as a range predicate, so per-user work is
bounded by touches-within-horizon × conversions — the horizon is the
lever that keeps a years-long power user from going quadratic (same
bounded-interval discipline as operators/rangejoin.py). Touch selection
is ``min_by``/``max_by`` over a (ts, event_id) struct — deterministic
under timestamp ties — in ONE groupBy per conversion; no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback: str = "7 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-conversion attribution rows: (conversion id, user, value,
    first_touch_type, last_touch_type). Conversions with no qualifying
    touch in the horizon are attributed to NULL (kept, not dropped —
    'organic' conversions are the baseline every model reports)."""
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        F.col(value_col).alias("value"),
    )
    touch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("__tu"),
        F.col(ts_col).alias("__tts"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("__tt"),
    )
    # horizon predicate INSIDE the left join: a user whose touches all
    # fall outside the lookback must still keep the conversion (as a
    # NULL-attributed row), same as a user with no touches at all
    cond = (
        (F.col("__u") == F.col("__tu"))
        & (F.col("__tts") <= F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.expr(f"INTERVAL {lookback}"))
    )
    joined = conv.join(touch, cond, "left")
    key = F.struct(F.col("__tts"), F.col("__tid"))
    return (
        joined.groupBy(
            "conversion_id", F.col("__u").alias("user_id"), "value"
        )
        .agg(
            F.min_by("__tt", key).alias("first_touch_type"),
            F.max_by("__tt", key).alias("last_touch_type"),
        )
    )

"""Stream-stream joins (SURVEY.md §2.9 ⊕).

Structured Streaming's stream-stream join buffers BOTH sides in state and
emits matches as they arrive; without bounds that state grows forever, so
the production form is always (a) watermarks on both event-time columns
and (b) a time-range join condition — together they let Spark expire
buffered rows once the watermark passes the range bound
(docs: structured-streaming-programming-guide, stream-stream joins).

Written batch-first like streaming/windows.py: the helper builds the same
equi-key + time-range condition for static frames (where it plans as a
range join the AQE can handle) and for streaming frames (where it becomes
a stateful StreamingSymmetricHashJoin) — so the DuckDB oracle verifies
the join semantics in batch while the REAL streaming execution is held to
the identical result set.

Scale: state per key is bounded by rows inside the watermark+range
horizon; the join shuffles both sides on the key — same partitioning, one
Exchange each. Skewed keys salt the same way batch joins do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_JOIN_TYPES = ("inner", "left_outer", "right_outer")


def interval_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "left_ts",
    right_ts: str = "right_ts",
    lower: str = "0 seconds",
    upper: str = "4 hours",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` with
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``. The two frames
    must already expose DISTINCT column names apart from ``key`` (rename
    upstream); timestamp columns are named per the arguments.

    ``how``: ``inner`` (default), ``left_outer`` or ``right_outer`` —
    the outer forms are the "did NOT convert within the horizon" query
    (click with no purchase inside 4 h). In streaming, an outer row's
    NULL side emits only once the watermark passes the range bound for
    that row — the stream equivalent of "the horizon has provably
    closed" — so outer results trail the inner ones by the watermark
    delay; a finite test stream must advance the watermark past the
    last row's horizon (e.g. with a sentinel event) to flush them.

    For streaming inputs, apply ``withWatermark`` on both sides BEFORE
    calling (the watermark column must be the join's event-time column) —
    Spark then derives the state-cleanup predicate from the range
    condition and drops expired rows from the join state; for outer
    joins the watermark is REQUIRED on the nullable side (Spark rejects
    the plan otherwise)."""
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {_JOIN_TYPES}, got {how!r}")
    cond = (
        (left[key] == right[key])
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    joined = left.join(right, cond, how)
    # drop the side whose key may be NULL on unmatched rows, keeping
    # exactly one non-null key column in the output
    drop_col = right[key] if how in ("inner", "left_outer") else left[key]
    return joined.drop(drop_col)

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


def interval_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "left_ts",
    right_ts: str = "right_ts",
    lower: str = "0 seconds",
    upper: str = "4 hours",
) -> DataFrame:
    """Inner join of ``left`` and ``right`` on ``key`` with
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``. The two frames
    must already expose DISTINCT column names apart from ``key`` (rename
    upstream); timestamp columns are named per the arguments.

    For streaming inputs, apply ``withWatermark`` on both sides BEFORE
    calling (the watermark column must be the join's event-time column) —
    Spark then derives the state-cleanup predicate from the range
    condition and drops expired rows from the join state."""
    cond = (
        (left[key] == right[key])
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond).drop(right[key])

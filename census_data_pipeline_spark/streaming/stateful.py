"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 extension: the escape hatch for operators the built-in
windowed aggregations can't express).

``running_user_totals`` maintains per-key running (count, sum) state across
micro-batches and emits the updated totals each batch — the canonical
shape for per-entity accumulators (counters, CUSUM-style monitors,
rate limiters) over an unbounded stream.

Scale: state lives in the state store, partitioned by key — the same
shuffle as a streaming groupBy; state size is O(distinct keys), not
O(events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running event count and value sum, updated per
    micro-batch. ``events`` must be a streaming DataFrame with columns
    ``user_id`` and ``value``.

    The update function is a self-contained closure (pandas imported
    inside, no module-level references) so cloudpickle ships it by value
    to workers that cannot import this package."""

    def update(key, batches: Iterator["pd.DataFrame"], state: GroupState):
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

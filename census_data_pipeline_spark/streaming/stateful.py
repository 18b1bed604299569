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

Eviction contracts (both ops): ``idle_timeout_ms`` is WALL-CLOCK
(ProcessingTimeTimeout) — simple, but a checkpoint replay at 10× speed
evicts differently than the live run did. ``event_time_horizon_ms``
(VERDICT r9 #3) is WATERMARK-DRIVEN (EventTimeTimeout): a key is evicted
when the stream's watermark passes its last event's timestamp plus the
horizon, so eviction is a pure function of the DATA — the same files
replayed at any trigger rate evict identically (unit-pinned). The knobs
are mutually exclusive.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _timeout_conf(idle_timeout_ms, event_time_horizon_ms):
    if idle_timeout_ms is not None and event_time_horizon_ms is not None:
        raise ValueError(
            "idle_timeout_ms and event_time_horizon_ms are mutually "
            "exclusive eviction contracts"
        )
    if idle_timeout_ms is not None:
        return GroupStateTimeout.ProcessingTimeTimeout
    if event_time_horizon_ms is not None:
        return GroupStateTimeout.EventTimeTimeout
    return GroupStateTimeout.NoTimeout


def _arm_event_timer(state: GroupState, last_ts_ms, horizon_ms: int):
    """Arm the watermark-driven eviction timer at last_event + horizon,
    clamped strictly above the current watermark (Spark rejects a
    timestamp at or below it — a straggler key whose horizon already
    passed is then evicted at the next watermark advance)."""
    wm = state.getCurrentWatermarkMs()
    target = wm + 1 + horizon_ms if last_ts_ms is None else last_ts_ms + horizon_ms
    state.setTimeoutTimestamp(max(target, wm + 1))


def running_user_totals(
    events: DataFrame,
    idle_timeout_ms: int | None = None,
    event_time_horizon_ms: int | None = None,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming: per-user running event count and value sum, updated per
    micro-batch. ``events`` must be a streaming DataFrame with columns
    ``user_id`` and ``value`` (plus ``ts_col`` when the event-time
    eviction knob is used).

    ``idle_timeout_ms`` is the WALL-CLOCK state-eviction contract for
    unbounded key spaces: when set, a key that receives no data for that
    long (checked at each subsequent micro-batch) has its state REMOVED
    from the store — a later row for the key restarts its accumulator
    from zero, exactly as if the key had never been seen.

    ``event_time_horizon_ms`` is the EVENT-TIME eviction contract
    (VERDICT r9 #3): the input is watermarked on ``ts_col`` (with
    ``watermark_delay``) and a key is evicted once the watermark passes
    its last event's timestamp + horizon. Because the watermark is
    computed from the DATA, a checkpoint replay at any trigger rate
    evicts the identical keys at the identical batch positions — the
    production-correct form for replayed/backfilled streams, where a
    wall-clock timeout would evict everything (fast replay never idles)
    or nothing (slow replay always idles). NOTE the standard timer
    semantics both variants share: eviction fires in a micro-batch where
    the key has NO data; a key whose horizon passed but which receives
    data in the same batch continues its state.

    ``None``/``None`` (default) keeps state forever, which is only safe
    when the key space is bounded (e.g. event types); keying an
    unbounded stream by ``user_id`` without a timeout accumulates
    dead-key state without bound.

    Runtime note: with a PROCESSING-time timeout configured, Spark
    schedules micro-batches CONTINUOUSLY (empty ones included) so
    expired timers fire — pair the knob with a real trigger interval
    (e.g. ``.trigger(processingTime="1 second")``), and observe the
    sink by polling: ``processAllAvailable()`` does not settle while
    timer batches keep running. EVENT-time timers fire only on
    watermark advances (data-driven), so ``processAllAvailable()``
    settles normally.

    The update function is a self-contained closure (pandas imported
    inside, no module-level references) so cloudpickle ships it by value
    to workers that cannot import this package."""

    timeout_ms = idle_timeout_ms
    horizon_ms = event_time_horizon_ms
    conf = _timeout_conf(idle_timeout_ms, event_time_horizon_ms)
    arm_event = _arm_event_timer

    def update(key, batches: Iterator["pd.DataFrame"], state: GroupState):
        import pandas as _pd

        if (timeout_ms is not None or horizon_ms is not None) \
                and state.hasTimedOut:
            # past the horizon: drop the key's state entirely; a late
            # arrival re-enters through the cold-start branch below
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            if horizon_ms is not None and len(pdf):
                mx = pdf["__ts"].dropna().max()
                if mx is not None and mx == mx:  # not NaT
                    ms = int(_pd.Timestamp(mx).value // 1_000_000)
                    last_ts = ms if last_ts is None else max(last_ts, ms)
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        elif horizon_ms is not None:
            arm_event(state, last_ts, horizon_ms)
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    src = events
    if horizon_ms is not None:
        from pyspark.sql import functions as F

        src = events.withWatermark(ts_col, watermark_delay).select(
            "user_id", "value", F.col(ts_col).alias("__ts")
        )
    else:
        src = events.select("user_id", "value")
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )


CUSUM_OUTPUT_SCHEMA = (
    "key string, n_obs long, s_pos double, s_neg double, n_alarms long"
)
CUSUM_STATE_SCHEMA = "sp double, sn double, n long, alarms long"


def cusum_monitor(
    stream: DataFrame,
    key_col: str = "event_type",
    t_col: str = "t",
    x_col: str = "y",
    mu_col: str = "mu0",
    slack_col: str = "slack",
    h_col: str = "h",
    idle_timeout_ms: int | None = None,
    event_time_horizon_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Per-key two-sided CUSUM change detector (Page 1954) as a custom
    stateful streaming operator — the canonical monitor a pipeline runs
    on per-source volume to catch level shifts the windowed aggregates
    smooth over. Each row carries its key's reference constants
    (μ₀/slack/threshold, computed batch-side on a training prefix and
    joined in), so state is exactly the CUSUM recursion:

        s⁺ ← max(0, s⁺ + (x − μ₀ − slack));  alarm & reset when s⁺ > h
        s⁻ ← max(0, s⁻ + (μ₀ − slack − x));  alarm & reset when s⁻ > h

    Rows are folded in ascending ``t_col`` order WITHIN each
    micro-batch; with a time-ordered source (stage_time_ordered_parquet
    + maxFilesPerTrigger=1) the fold is the exact global-order
    recursion, carried across micro-batches in the state store — the
    determinism contract the SQL oracle replicates step by step.
    Emits the running (n_obs, s⁺, s⁻, n_alarms) per key per batch
    (update mode); n_obs is monotone, so the final row per key is the
    max-n_obs one.

    Scale: state is 4 scalars per key; the shuffle is the same
    key-hash exchange as a streaming groupBy. ``idle_timeout_ms`` is
    the WALL-CLOCK eviction contract for unbounded key spaces: a key
    idle that long has its state REMOVED — a late row restarts the
    recursion from (0, 0, 0, 0). ``event_time_horizon_ms`` (VERDICT r9
    #3) is the WATERMARK-DRIVEN form: ``t_col`` must be a TIMESTAMP,
    the stream is watermarked on it (``watermark_delay``), and a key is
    evicted once the watermark passes its last observation + horizon —
    a pure function of the data, so replays at any trigger rate evict
    identically (unit-pinned). The knobs are mutually exclusive;
    default ``None``/``None`` (keep forever) is only safe for bounded
    key spaces such as event types. With the PROCESSING-time knob set,
    pair the query with a real trigger interval and poll the sink —
    Spark schedules continuous (possibly empty) micro-batches to fire
    timers, so ``processAllAvailable()`` does not settle (see
    ``running_user_totals``); event-time timers fire on watermark
    advances, so it settles normally."""

    timeout_ms = idle_timeout_ms
    horizon_ms = event_time_horizon_ms
    conf = _timeout_conf(idle_timeout_ms, event_time_horizon_ms)
    arm_event = _arm_event_timer

    def update(key, batches: Iterator["pd.DataFrame"], state: GroupState):
        import pandas as _pd

        if (timeout_ms is not None or horizon_ms is not None) \
                and state.hasTimedOut:
            state.remove()
            return
        sp, sn, n, alarms = (
            state.get if state.exists else (0.0, 0.0, 0, 0)
        )
        pdf = _pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values("__t")
        for x, mu, sl, h in zip(
            pdf["__x"], pdf["__mu"], pdf["__sl"], pdf["__h"]
        ):
            x, mu, sl, h = float(x), float(mu), float(sl), float(h)
            sp = max(0.0, sp + (x - mu - sl))
            sn = max(0.0, sn + (mu - sl - x))
            n += 1
            if sp > h:
                alarms += 1
                sp = 0.0
            if sn > h:
                alarms += 1
                sn = 0.0
        state.update((sp, sn, n, alarms))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        elif horizon_ms is not None:
            last_ts = None
            if len(pdf):
                mx = pdf["__t"].dropna().max()
                if mx is not None and mx == mx:  # not NaT
                    last_ts = int(_pd.Timestamp(mx).value // 1_000_000)
            arm_event(state, last_ts, horizon_ms)
        yield _pd.DataFrame(
            {"key": [key[0]], "n_obs": [n], "s_pos": [sp],
             "s_neg": [sn], "n_alarms": [alarms]}
        )

    from pyspark.sql import functions as F

    src = stream
    if horizon_ms is not None:
        src = src.withWatermark(t_col, watermark_delay)
    return (
        src.select(
            F.col(key_col).alias("__key"),
            F.col(t_col).alias("__t"),
            F.col(x_col).cast("double").alias("__x"),
            F.col(mu_col).cast("double").alias("__mu"),
            F.col(slack_col).cast("double").alias("__sl"),
            F.col(h_col).cast("double").alias("__h"),
        )
        .groupBy("__key")
        .applyInPandasWithState(
            update,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )

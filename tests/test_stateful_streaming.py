"""Custom stateful operator (applyInPandasWithState) driven through a real
streaming query; final state must equal the batch groupBy totals."""

from __future__ import annotations

import pytest

from census_data_pipeline_spark.sources.catalog import load_table
from census_data_pipeline_spark.streaming import windows
from census_data_pipeline_spark.streaming.stateful import running_user_totals


def test_running_totals_match_batch(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events")
    batch = load_table(spark, sf_dir, "events")
    batch.write.mode("overwrite").parquet(path)

    stream = windows.stream_from_parquet(spark, path, spark.read.parquet(path).schema)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode emits one row per key per batch; last emission per key
        # is the final state (single batch here -> exactly one row per key)
        got = {
            r.user_id: (r.n_events, round(r.total_value, 4))
            for r in spark.sql("SELECT * FROM stateful_out").collect()
        }
    finally:
        q.stop()

    from pyspark.sql import functions as F

    expected = {
        r.user_id: (r.n, round(r.t, 4))
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("t"),
        )
        .collect()
    }
    assert got == expected


def _wait_for(spark, view, tup, cols, timeout_s=90):
    """Poll a memory-sink view until ``tup`` appears (ProcessingTime
    timers keep scheduling empty micro-batches, so processAllAvailable
    never settles — polling is the correct observation here)."""
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        got = {
            tuple(getattr(r, c) for c in cols)
            for r in spark.sql(f"SELECT * FROM {view}").collect()
        }
        if tup in got:
            return got
        time.sleep(0.3)
    raise AssertionError(f"{tup} never appeared in {view}: {got}")


def test_idle_timeout_evicts_state_and_late_row_restarts(spark, tmp_path):
    """Eviction contract (idle_timeout_ms): state accumulates across
    micro-batches INSIDE the horizon, a key idle past the horizon has
    its state dropped by the fired timer, and its next row restarts the
    accumulator from zero — exactly as if the key had never been seen."""
    import time

    path = str(tmp_path / "evict")
    schema = "user_id long, value double"
    cols = ("user_id", "n_events", "total_value")

    def write_chunk(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    # two files staged up front: maxFilesPerTrigger=1 makes them two
    # back-to-back batches, proving cross-batch accumulation in-horizon
    write_chunk([(1, 1.0), (1, 1.0), (2, 10.0), (2, 10.0), (2, 10.0)])
    write_chunk([(1, 1.0)])
    stream = windows.stream_from_parquet(
        spark, path, spark.read.parquet(path).schema, max_files_per_trigger=1
    )
    q = (
        running_user_totals(stream, idle_timeout_ms=2500)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("evict_out")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        _wait_for(spark, "evict_out", (1, 3, 3.0), cols)
        _wait_for(spark, "evict_out", (2, 3, 30.0), cols)
        time.sleep(6.0)  # both keys idle past the 2.5 s horizon
        # late rows: state was evicted, so these restart from zero
        write_chunk([(2, 10.0), (2, 10.0)])
        _wait_for(spark, "evict_out", (2, 2, 20.0), cols)
        write_chunk([(1, 1.0)])
        emitted = _wait_for(spark, "evict_out", (1, 1, 1.0), cols)
    finally:
        q.stop()

    # restart means the pre-eviction totals were NOT continued
    assert (1, 4, 4.0) not in emitted
    assert (2, 5, 50.0) not in emitted


def test_cusum_idle_timeout_restarts_recursion(spark, tmp_path):
    """CUSUM + idle_timeout_ms: an evicted key's recursion restarts at
    (0, 0, 0, 0) — n_obs resets instead of continuing its count."""
    import time

    from census_data_pipeline_spark.streaming.stateful import cusum_monitor

    path = str(tmp_path / "cusum_evict")
    schema = "k string, t int, x double, mu0 double, sl double, h double"

    def write_chunk(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    write_chunk([("b", 1, 1.0, 1.0, 0.25, 5.0),
                 ("b", 2, 1.0, 1.0, 0.25, 5.0)])
    stream = windows.stream_from_parquet(
        spark, path, spark.read.parquet(path).schema, max_files_per_trigger=1
    )
    q = (
        cusum_monitor(stream, key_col="k", t_col="t", x_col="x",
                      mu_col="mu0", slack_col="sl", h_col="h",
                      idle_timeout_ms=2500)
        .writeStream.outputMode("update")
        .format("memory").queryName("cusum_evict_out")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        def n_obs_b():
            return sorted(
                r.n_obs
                for r in spark.sql(
                    "SELECT n_obs FROM cusum_evict_out WHERE key = 'b'"
                ).collect()
            )

        deadline = time.time() + 90
        while n_obs_b() != [2] and time.time() < deadline:
            time.sleep(0.3)
        assert n_obs_b() == [2]
        time.sleep(6.0)  # b idles past the horizon; its timer evicts
        write_chunk([("b", 3, 1.0, 1.0, 0.25, 5.0)])  # b restarts fresh
        deadline = time.time() + 90
        while 1 not in n_obs_b() and time.time() < deadline:
            time.sleep(0.3)
        got = n_obs_b()
    finally:
        q.stop()

    # 2 from the first batch, then 1 after eviction — never 3
    assert got == [1, 2]


def _run_cusum(spark, df, n_chunks, name):
    import tempfile

    from census_data_pipeline_spark.streaming.stateful import cusum_monitor

    staged = tempfile.mkdtemp(prefix="cusum_t_") + "/s"
    windows.stage_time_ordered_parquet(df, "t", staged, n_chunks=n_chunks)
    stream = windows.stream_from_parquet(
        spark, staged, df.schema, max_files_per_trigger=1
    )
    q = (
        cusum_monitor(stream, key_col="k", t_col="t", x_col="x",
                      mu_col="mu0", slack_col="sl", h_col="h")
        .writeStream.outputMode("update")
        .format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            f"SELECT key, n_obs, s_pos, s_neg, n_alarms FROM ("
            f"  SELECT *, row_number() OVER ("
            f"    PARTITION BY key ORDER BY n_obs DESC) AS rn FROM {name}"
            f") WHERE rn = 1"
        ).collect()
    finally:
        q.stop()
    return {r.key: (r.n_obs, round(r.s_pos, 6), round(r.s_neg, 6),
                    r.n_alarms) for r in rows}


def test_cusum_planted_shift_alarms_and_batch_invariance(spark):
    """A level shift of +3σ-equivalent after t=30 must raise positive-
    side alarms and none on the negative side; and the fold must be
    IDENTICAL whether the stream replays as 1 mega-batch or 6 ordered
    micro-batches (state carried across batches)."""
    rows = [("a", t, 1.0 if t <= 30 else 4.0, 1.0, 0.25, 5.0)
            for t in range(1, 61)]
    # flat key: never alarms
    rows += [("b", t, 1.0, 1.0, 0.25, 5.0) for t in range(1, 61)]
    df = spark.createDataFrame(
        rows, "k string, t int, x double, mu0 double, sl double, h double"
    )
    multi = _run_cusum(spark, df, 6, "cusum_multi")
    single = _run_cusum(spark, df, 1, "cusum_single")
    assert multi == single
    a = multi["a"]
    assert a[0] == 60 and a[3] >= 2 and a[2] == 0.0  # alarms, no s_neg
    assert multi["b"] == (60, 0.0, 0.0, 0)
    # hand-fold the expected trajectory
    sp = sn = 0.0
    alarms = 0
    for t in range(1, 61):
        x = 1.0 if t <= 30 else 4.0
        sp = max(0.0, sp + (x - 1.0 - 0.25))
        sn = max(0.0, sn + (1.0 - 0.25 - x))
        if sp > 5.0:
            alarms += 1
            sp = 0.0
        if sn > 5.0:
            alarms += 1
            sn = 0.0
    assert a == (60, round(sp, 6), round(sn, 6), alarms)


def _run_event_time_replay(spark, path, name, trigger_ms):
    """Replay the staged 4-file sequence (maxFilesPerTrigger=1) with the
    event-time horizon and return the emitted row set."""
    from census_data_pipeline_spark.streaming.stateful import (
        running_user_totals,
    )

    stream = windows.stream_from_parquet(
        spark, path, spark.read.parquet(path).schema, max_files_per_trigger=1
    )
    q = (
        running_user_totals(stream, event_time_horizon_ms=3_600_000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.n_events, round(r.total_value, 4))
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()
    return got


def test_event_time_horizon_evicts_identically_at_any_replay_speed(
    spark, tmp_path
):
    """event_time_horizon_ms (VERDICT r9 #3): eviction keyed to the
    WATERMARK, not the wall clock. Four staged files replay as four
    ordered micro-batches: A's last event is 10:00, the watermark
    passes 11:00 (A's 1h horizon) in batch 3 while A has no data, so
    A is evicted and its batch-4 row restarts from zero. The SAME
    files replayed at a 10× slower trigger evict identically — with
    the wall-clock knob, replay speed would change the outcome."""
    from datetime import datetime

    path = str(tmp_path / "et_evict")
    schema = "user_id long, value double, ts timestamp"

    def write_chunk(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    d = datetime
    write_chunk([(1, 1.0, d(2026, 1, 1, 10, 0)),
                 (2, 10.0, d(2026, 1, 1, 10, 0))])
    write_chunk([(2, 10.0, d(2026, 1, 1, 12, 0))])   # wm -> 10:00, then 12:00
    write_chunk([(2, 10.0, d(2026, 1, 1, 12, 5))])   # A idle: timer fires
    write_chunk([(1, 2.0, d(2026, 1, 1, 12, 10))])   # A restarts from zero

    fast = _run_event_time_replay(spark, path, "et_fast", 100)
    slow = _run_event_time_replay(spark, path, "et_slow", 1000)
    assert fast == slow
    assert (1, 1, 1.0) in fast      # A before eviction
    assert (1, 1, 2.0) in fast      # A restarted from zero after eviction
    assert (1, 2, 3.0) not in fast  # never continued across the horizon
    assert (2, 3, 30.0) in fast     # B kept accumulating (timer kept moving)


def test_cusum_event_time_horizon_restarts_recursion(spark, tmp_path):
    """CUSUM + event_time_horizon_ms: t is a TIMESTAMP, the stream is
    watermarked on it, and a key whose last observation falls a horizon
    behind the watermark restarts at (0,0,0,0) — no sleeps, the data
    alone drives eviction."""
    from datetime import datetime

    from census_data_pipeline_spark.streaming.stateful import cusum_monitor

    path = str(tmp_path / "cusum_et")
    schema = ("k string, t timestamp, x double, mu0 double, sl double,"
              " h double")

    def write_chunk(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    d = datetime
    write_chunk([("b", d(2026, 1, 1, 10, 0), 1.0, 1.0, 0.25, 5.0),
                 ("b", d(2026, 1, 1, 10, 5), 1.0, 1.0, 0.25, 5.0)])
    write_chunk([("c", d(2026, 1, 1, 12, 0), 1.0, 1.0, 0.25, 5.0)])
    write_chunk([("c", d(2026, 1, 1, 12, 5), 1.0, 1.0, 0.25, 5.0)])
    write_chunk([("b", d(2026, 1, 1, 12, 10), 1.0, 1.0, 0.25, 5.0)])

    stream = windows.stream_from_parquet(
        spark, path, spark.read.parquet(path).schema, max_files_per_trigger=1
    )
    q = (
        cusum_monitor(stream, key_col="k", t_col="t", x_col="x",
                      mu_col="mu0", slack_col="sl", h_col="h",
                      event_time_horizon_ms=3_600_000)
        .writeStream.outputMode("update")
        .format("memory").queryName("cusum_et_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r.n_obs
            for r in spark.sql(
                "SELECT n_obs FROM cusum_et_out WHERE key = 'b'"
            ).collect()
        )
    finally:
        q.stop()
    # 2 from the first batch, then 1 after watermark-driven eviction
    assert got == [1, 2]


def test_eviction_knobs_mutually_exclusive(spark):
    from census_data_pipeline_spark.streaming.stateful import (
        cusum_monitor, running_user_totals,
    )

    df = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "CAST(value AS DOUBLE) AS value",
        "timestamp AS ts", "'k' AS k", "timestamp AS t",
        "CAST(0 AS DOUBLE) AS x", "CAST(0 AS DOUBLE) AS mu0",
        "CAST(0 AS DOUBLE) AS sl", "CAST(1 AS DOUBLE) AS h",
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        running_user_totals(df, idle_timeout_ms=1000,
                            event_time_horizon_ms=1000)
    with pytest.raises(ValueError, match="mutually exclusive"):
        cusum_monitor(df, key_col="k", t_col="t", x_col="x",
                      mu_col="mu0", slack_col="sl", h_col="h",
                      idle_timeout_ms=1000, event_time_horizon_ms=1000)

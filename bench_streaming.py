#!/usr/bin/env python
"""Streaming benchmark (VERDICT r4 #8): the REAL Structured Streaming
queries are excluded from bench.py by design — their cost is state-store
plus micro-batch machinery, not engine operators — so this artifact
measures them separately: end-to-end wall (stage parquet -> stream ->
drain memory sink -> read result), micro-batch count, input rows, and
peak state-store rows.

Metrics come from a ``StreamingQueryListener`` attached to the session:
each micro-batch emits a progress event carrying ``batchId``,
``numInputRows`` and per-stateful-operator ``numRowsTotal`` — the same
numbers the Spark UI's streaming tab shows, so the artifact reflects
what an operator would see in production monitoring.

Prints ONE JSON line:
  {"metric": "streaming_query_wall_total", "value": N, "unit": "sec",
   "queries": {name: {"wall_sec": s, "out_rows": n, "micro_batches": b,
                      "input_rows": i, "state_rows_peak": r}}, "sf": f}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from census_data_pipeline_spark.plans import QUERIES  # noqa: E402
from census_data_pipeline_spark.session import get_spark  # noqa: E402

# every registered query that runs a real writeStream (micro-batch
# execution against a state store), in registration order
STREAMING_QUERIES = [
    "streaming_tumbling_1h",
    "streaming_enriched_rollup",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_dedup_events",
    "streaming_ohlc_hourly",
    "streaming_session_5m",
    "streaming_session_5m_append",
    "streaming_cusum_hourly",
]


class _ProgressCollector(StreamingQueryListener):
    """Accumulates every query-progress event on the session. Events are
    delivered asynchronously on the listener bus — callers snapshot
    ``len(events)`` around a run and settle briefly after stop()."""

    def __init__(self) -> None:
        self.events: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.events.append(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def _settle(collector: _ProgressCollector, n_before: int) -> list[dict]:
    """Wait (bounded) for the listener bus to drain, then return the
    events appended since the snapshot."""
    deadline = time.time() + 5.0
    last = -1
    while time.time() < deadline:
        now = len(collector.events)
        if now == last and now > n_before:
            break
        last = now
        time.sleep(0.2)
    return collector.events[n_before:]


def _event_time_eviction_scenario(spark, sf_dir, collector) -> dict:
    """Event-time eviction at stream scale (VERDICT r9 #3): the events
    table keyed by USER-DAY (an unbounded-key-space stand-in — new keys
    appear every day and old ones go dead), replayed as 8 ascending-time
    micro-batches through ``running_user_totals`` with a 1-day
    ``event_time_horizon_ms``. Keys whose last event falls a day behind
    the watermark are evicted by their event-time timers, so
    ``state_rows_peak`` must sit at O(keys live within the horizon) —
    a small multiple of keys-per-day — not at the total distinct key
    count a timeout-free run accumulates (reported beside it)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from census_data_pipeline_spark.sources.catalog import load_table
    from census_data_pipeline_spark.streaming import stateful, windows

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") * F.lit(1000)
         + F.dayofmonth("ts")).alias("user_id"),
        "value", "ts",
    )
    total_keys = ev.select("user_id").distinct().count()
    staged_root = tempfile.mkdtemp(prefix="stream_evict_")
    staged = staged_root + "/events"
    windows.stage_time_ordered_parquet(ev, "ts", staged, n_chunks=8)
    stream = windows.stream_from_parquet(
        spark, staged, ev.schema, max_files_per_trigger=1
    )
    n_before = len(collector.events)
    t0 = time.perf_counter()
    out = stateful.running_user_totals(
        stream, event_time_horizon_ms=86_400_000
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("bench_et_evict")
        .start()
    )
    try:
        q.processAllAvailable()
        out_rows = spark.table("bench_et_evict").count()
    finally:
        q.stop()
        shutil.rmtree(staged_root, ignore_errors=True)
    wall = time.perf_counter() - t0
    progresses = _settle(collector, n_before)
    batch_ids = {p.get("batchId") for p in progresses
                 if p.get("numInputRows", 0) > 0}
    input_rows = sum(p.get("numInputRows", 0) for p in progresses)
    state_peak = max(
        (
            sum(op.get("numRowsTotal", 0)
                for op in p.get("stateOperators", []))
            for p in progresses
        ),
        default=0,
    )
    return {
        "wall_sec": round(wall, 3),
        "out_rows": out_rows,
        "micro_batches": len(batch_ids),
        "input_rows": input_rows,
        "state_rows_peak": state_peak,
        "distinct_keys_total": total_keys,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="bench_streaming")
    collector = _ProgressCollector()
    spark.streams.addListener(collector)

    results: dict[str, dict] = {}
    for name in STREAMING_QUERIES:
        n_before = len(collector.events)
        t0 = time.perf_counter()
        out_rows = QUERIES[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        progresses = _settle(collector, n_before)
        batch_ids = {p.get("batchId") for p in progresses
                     if p.get("numInputRows", 0) > 0}
        input_rows = sum(p.get("numInputRows", 0) for p in progresses)
        state_peak = max(
            (
                sum(op.get("numRowsTotal", 0)
                    for op in p.get("stateOperators", []))
                for p in progresses
            ),
            default=0,
        )
        results[name] = {
            "wall_sec": round(wall, 3),
            "out_rows": out_rows,
            "micro_batches": len(batch_ids),
            "input_rows": input_rows,
            "state_rows_peak": state_peak,
        }

    results["stateful_event_time_eviction"] = _event_time_eviction_scenario(
        spark, sf_dir, collector
    )

    total = round(sum(r["wall_sec"] for r in results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "streaming_query_wall_total",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

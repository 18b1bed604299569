#!/usr/bin/env python
"""Paired per-query probe (r14): bench-methodology timing for a NAMED
subset of queries, split into BUILD (the ``QUERIES[name](spark, dir)``
call — driver-side plan construction plus any eager jobs the operator
runs) and EXEC (the noop sink, guide §1.4). The r13 lesson
(OPTIMIZATION_r13.md): the iterative operators' cost hides in BUILD, so
whole-query timings alone cannot attribute a win.

Usage: python tools/probe_queries.py q1 q2 ...  [env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_BENCH_RUNS (default 3), SPARK_GRAFT_PROBE_OUT]

Prints one JSON line: {"queries": {name: {"build": s, "exec": s,
"total": s, "build_mean": ..., "exec_mean": ...}}} (min over runs,
after one sf0.001 warm pass — same discipline as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from census_data_pipeline_spark.plans import QUERIES  # noqa: E402
from census_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark(app_name="probe")
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for n in names:
            try:
                QUERIES[n](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
    out: dict = {}
    for n in names:
        builds, execs = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = QUERIES[n](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        out[n] = {
            "build": round(min(builds), 3),
            "exec": round(min(execs), 3),
            "total": round(min(b + e for b, e in zip(builds, execs)), 3),
            "build_mean": round(sum(builds) / len(builds), 3),
            "exec_mean": round(sum(execs) / len(execs), 3),
        }
    rec = {"sf_dir": sf_dir, "runs": runs, "queries": out}
    path = os.environ.get("SPARK_GRAFT_PROBE_OUT")
    if path:
        with open(path, "w") as fh:
            json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()

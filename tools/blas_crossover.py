#!/usr/bin/env python
"""Measure the BLAS-vs-Catalyst crossover for embedding_dup_pairs
(VERDICT r5 #8): at which corpus size does the opt-in exact BLAS path
(driver collect + Arrow-batch matmul, O(n²·d)) stop beating the default
LSH-verify path (seeded sign-bucket candidates + exact Catalyst cosine,
~O(n·candidates))?

Synthetic corpus: deterministic unit-ish vectors with planted near-dup
pairs (every 10th vector is a jittered copy of its predecessor) so both
methods do real verify work. Prints one JSON line per (n, dim) cell:
  {"n": ..., "dim": ..., "blas_sec": ..., "lsh_sec": ..., "pairs": ...}
and a final summary with the measured crossover per dim. Results are
recorded in SCALING.md §BLAS.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from census_data_pipeline_spark.functions.similarity import (  # noqa: E402
    embedding_dup_pairs,
)
from census_data_pipeline_spark.session import get_spark  # noqa: E402


def make_corpus(spark, n: int, dim: int):
    """Deterministic vectors: base direction from sin/cos of the id;
    every 10th vector = previous id's vector + tiny jitter (a planted
    near-dup)."""
    base = F.col("vec_id") - F.when(F.col("vec_id") % 10 == 9, 1).otherwise(0)
    comps = [
        F.round(
            F.sin(base * F.lit(0.7301 + 0.13 * j))
            + F.when(F.col("vec_id") % 10 == 9, F.lit(1e-4 * (j % 3)))
            .otherwise(F.lit(0.0)),
            6,
        )
        for j in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    ).localCheckpoint(eager=True)


def main() -> None:
    spark = get_spark(app_name="blas_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    dims = [16, 64, 256]
    sizes = [2_000, 8_000, 32_000, 64_000]
    rows = []
    for dim in dims:
        for n in sizes:
            corpus = make_corpus(spark, n, dim)
            t0 = time.perf_counter()
            n_blas = embedding_dup_pairs(
                corpus, threshold=0.999, method="exact",
                blas_max_rows=10_000_000,
            ).count()
            blas = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_lsh = embedding_dup_pairs(
                corpus, threshold=0.999, method="lsh", dim=dim,
            ).count()
            lsh = time.perf_counter() - t0
            rec = {"n": n, "dim": dim, "blas_sec": round(blas, 2),
                   "lsh_sec": round(lsh, 2), "blas_pairs": n_blas,
                   "lsh_pairs": n_lsh}
            rows.append(rec)
            print(json.dumps(rec), flush=True)
            corpus.unpersist()
            if blas > 90:
                break
    # crossover per dim: smallest n where LSH wins
    summary = {}
    for dim in dims:
        cells = [r for r in rows if r["dim"] == dim]
        won = [r["n"] for r in cells if r["lsh_sec"] < r["blas_sec"]]
        summary[str(dim)] = min(won) if won else f">{max(r['n'] for r in cells)}"
    print(json.dumps({"crossover_n_by_dim": summary}))
    spark.stop()


if __name__ == "__main__":
    main()

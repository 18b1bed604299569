"""Query registry plumbing shared by the driver contract
(``__spark_entry__.py``), the local oracle-parity tests and ``bench.py``.

Each registered query is a (Spark callable, optional DuckDB oracle SQL)
pair: the callable exercises engine operators; the SQL defines the expected
result in ANSI SQL. Column names and rounding are kept identical on both
sides because the driver hash-compares values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


# Reentrancy depth for the per-query cache sweep below (registered
# queries never call each other today; the guard keeps that safe if one
# ever does).
_ACTIVE_DEPTH = 0


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a rows-only check
    (non-SQL-expressible op, per the driver contract).

    r13: every top-level query invocation first drops the SQL cache.
    The iterative operators (trained-in-engine fits, the graph
    community tier) persist intermediates that must stay live until the
    caller executes the returned frame — so they cannot unpersist
    themselves — and a long-lived session (bench.py runs 215 queries ×
    4 passes) otherwise accumulates hundreds of cached frames whose
    memory pressure and GC tax every later query (measured: the same
    query runs seconds slower late in a bench session than in a fresh
    one). Clearing at query START is safe: cached data is a
    performance-only artifact — any still-referenced frame recomputes
    from lineage — and the driver/bench execute each query's result
    before building the next."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            global _ACTIVE_DEPTH
            if _ACTIVE_DEPTH == 0:
                try:
                    spark.catalog.clearCache()
                except Exception:
                    pass
            _ACTIVE_DEPTH += 1
            try:
                return fn(spark, sf_dir)
            finally:
                _ACTIVE_DEPTH -= 1

        wrapped.__name__ = getattr(fn, "__name__", name)
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco

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


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a rows-only check
    (non-SQL-expressible op, per the driver contract)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco

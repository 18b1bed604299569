"""Skew-aware aggregation helper (SURVEY.md §7.3: group-by-state keys are
skewed — CA tracts >> WY; in the test lake, hot ``event_type`` / nation keys).

First line of defence is AQE (``spark.sql.adaptive.skewJoin.enabled`` — on by
default in our session). For *aggregations* on pathologically hot keys this
module provides classic two-phase salting: groupBy (key, salt) partial, then
groupBy key final. Exact for algebraic aggregates (sum/count/min/max);
``avg`` is decomposed into sum+count. Non-algebraic aggs (median) cannot be
salted exactly — use percentile_approx at scale instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALTABLE = {"sum", "count", "min", "max", "avg"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: ``aggs`` is (fn, col, alias) with
    fn in {sum, count, min, max, avg}. Results are identical to a direct
    groupBy — the salt only bounds the per-task group size."""
    for fn, _, _ in aggs:
        if fn not in _SALTABLE:
            raise ValueError(f"{fn!r} is not exactly saltable")

    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))

    partial_exprs = []
    for i, (fn, col, _) in enumerate(aggs):
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p{i}"))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p{i}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p{i}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p{i}"))
        else:  # avg -> (sum, count) pair
            partial_exprs.append(F.sum(col).alias(f"__p{i}_s"))
            partial_exprs.append(F.count(col).alias(f"__p{i}_c"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)

    final_exprs = []
    for i, (fn, _, alias) in enumerate(aggs):
        if fn == "sum":
            final_exprs.append(F.sum(f"__p{i}").alias(alias))
        elif fn == "count":
            final_exprs.append(F.sum(f"__p{i}").cast("long").alias(alias))
        elif fn == "min":
            final_exprs.append(F.min(f"__p{i}").alias(alias))
        elif fn == "max":
            final_exprs.append(F.max(f"__p{i}").alias(alias))
        else:
            final_exprs.append(
                (F.sum(f"__p{i}_s") / F.sum(f"__p{i}_c")).alias(alias)
            )
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for extreme key skew: the big side gets a
    deterministic salt in [0, n_salts), the small side is replicated once
    per salt, and the join runs on (keys..., salt) — so a hot key's rows
    spread across ``n_salts`` reducers instead of melting one task.
    Results are identical to ``big.join(small, on, how)``.

    Use when AQE's skew-join splitting isn't enough (it splits partitions,
    not single hot KEYS on the build side) and the small side is too big to
    broadcast outright — replication costs small x n_salts, so keep
    n_salts modest. Supported how: inner, left (each big row carries
    exactly one salt, so left-outer semantics survive replication).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner', 'left'}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")

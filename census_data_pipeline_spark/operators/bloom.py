"""Bloom-filter semi-join pruning — the runtime-filter technique Spark's
optimizer applies to shuffle joins (InjectRuntimeFilter), exposed as an
explicit operator for when the planner can't see the opportunity:
pre-filter a huge probe side with a compact bloom filter of the build
side's keys BEFORE the real join, so the shuffle moves only rows that
can possibly match (plus the false-positive margin).

Spark's internal ``bloom_filter_agg`` is not registered in the public
FunctionRegistry, so the filter here is built from first principles as
pure Catalyst — which buys something the built-in cannot: engine-exact
reproducibility. Bit positions come from md5 prefixes (identical hex in
every engine), so an ANSI-SQL oracle reproduces the EXACT surviving row
set, false positives included — no accuracy-contract hand-waving.

Construction (k hashes over m = 2^b bits):
  position_i(key) = int(md5(i || ':' || key)[:8] as hex) mod m
  build:  explode k positions per key -> (word=pos/63, bit=pos%63)
          -> groupBy(word) bit_or(1<<bit): a <= m/63-row bitset frame
          (63 bits per long: DuckDB overflow-checks 1<<63, and Spark's
          arithmetic shiftright of a sign-bit word needs masking — 63
          dodges both portably)
          -> ONE DENSE ARRAY row broadcast to the probe. Dense array,
          not a map: Spark's MapType element_at is a LINEAR SCAN of the
          entries, so k lookups x m/63 entries x rows went quadratic
          (measured 86 s on 600k rows); ArrayType element_at is O(1).
  probe:  map-only — k O(1) array lookups + bit tests per row, no
          shuffle, fused into the scan.

At 100 TB this targets the middle regime a broadcast-hash join can't:
build side too big to broadcast raw, join selectivity small — the probe
shuffles matches+fpp·non-matches instead of everything. The bitset is
m/8 bytes regardless of build-side row count (64 KiB for m=2^19).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pos_expr(i: int, key: str, m: int) -> str:
    """Spark-SQL text of hash position i for a (string-castable) key
    column — kept as text so the bit-shift amounts can be expressions
    (the pyspark shiftleft/shiftright wrappers take only literal ints)."""
    return (
        f"(CAST(conv(substring(md5(concat_ws(':', '{i}', "
        f"CAST({key} AS STRING))), 1, 8), 16, 10) AS BIGINT) % {m})"
    )


def optimal_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) from the standard formulas, m rounded up to a
    power of two (so ``% m`` is uniform over md5's 32-bit prefix)."""
    if expected_items < 1:
        raise ValueError("expected_items must be >= 1")
    if not 0 < fpp < 1:
        raise ValueError("fpp must be in (0, 1)")
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m = 1 << (m - 1).bit_length()
    k = max(1, round(m / max(expected_items, 1) * math.log(2)))
    return m, min(k, 16)


def build_bloom(
    df: DataFrame, key: str, expected_items: int, fpp: float = 0.01
) -> DataFrame:
    """1-row bloom filter of ``key``: (``__ba`` dense array<long> of
    ceil(m/63) bitset words, ``__m`` bits, ``__k`` hashes)."""
    m, k = optimal_params(expected_items, fpp)
    n_words = -(-m // 63)
    pos_arr = "array(" + ", ".join(
        _pos_expr(i, key, m) for i in range(k)
    ) + ")"
    words = (
        df.select(F.explode(F.expr(pos_arr)).alias("__pos"))
        .select(
            F.expr("CAST(__pos DIV 63 AS BIGINT)").alias("__word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 63 AS INT))"
            ).alias("__one"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__one").alias("__bits"))
    )
    # densify the sparse (word, bits) pairs into an O(1)-indexable
    # array: runs ONCE on a single row (n_words x set-words fold)
    return words.agg(
        F.collect_list(F.struct("__word", "__bits")).alias("__pairs")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), w -> "
            f"coalesce(aggregate(filter(__pairs, p -> p.__word = w), "
            f"CAST(0 AS BIGINT), (acc, p) -> acc | p.__bits), "
            f"CAST(0 AS BIGINT)))"
        ).alias("__ba"),
        F.lit(m).alias("__m"),
        F.lit(k).alias("__k"),
    )


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    expected_items: int,
    fpp: float = 0.01,
) -> DataFrame:
    """Rows of ``probe`` whose key MIGHT be in ``build``'s key set:
    guaranteed superset of the true semi-join (no false negatives),
    ~``fpp`` of non-matching keys surviving. Follow with the real join —
    its input is now matches+ε. Map-only on the probe (the filter row
    broadcasts; k map lookups per row, no shuffle)."""
    m, k = optimal_params(expected_items, fpp)
    bf = build_bloom(build, build_key, expected_items, fpp)
    # Inline position expressions, NOT a materialized position array:
    # AND short-circuits, so a non-matching row usually stops after its
    # first unset bit (~2 md5s); the hoisted-array form always computes
    # all k positions and measured ~35% slower end-to-end.
    # & 1, not % 2: shiftright is ARITHMETIC, and a negative long
    # (bit 63 set) modulo 2 is -1 in Spark's sign convention
    checks = [
        f"(shiftright(element_at(__ba, "
        f"CAST({_pos_expr(i, probe_key, m)} DIV 63 AS INT) + 1), "
        f"CAST({_pos_expr(i, probe_key, m)} % 63 AS INT)) & 1) = 1"
        for i in range(k)
    ]
    cond = F.expr(" AND ".join(checks))
    return probe.crossJoin(F.broadcast(bf)).filter(cond).drop(
        "__ba", "__m", "__k"
    )


def bloom_sql_condition(
    probe_key: str, build_keys_cte: str, expected_items: int,
    fpp: float = 0.01,
) -> tuple[str, str]:
    """ANSI-SQL replica of the probe condition for oracle use: a row
    survives iff all k of its bit positions are set by SOME build key.
    ``build_keys_cte`` is a SQL relation with one column ``key``."""
    m, k = optimal_params(expected_items, fpp)

    def pos_sql(i: int, key: str) -> str:
        return (
            f"(('0x' || substr(md5({i} || ':' || CAST({key} AS VARCHAR))"
            f", 1, 8))::BIGINT % {m})"
        )  # same bytes md5s as _pos_expr: concat_ws(':') == i || ':' || key

    build_bits = " UNION ALL ".join(
        f"SELECT {pos_sql(i, 'key')} AS pos FROM ({build_keys_cte})"
        for i in range(k)
    )
    checks = " AND ".join(
        f"EXISTS (SELECT 1 FROM __bloom_words w WHERE "
        f"w.word = {pos_sql(i, probe_key)} // 63 AND "
        f"((w.bits >> ({pos_sql(i, probe_key)} % 63)::INT) & 1) = 1"
        f")"
        for i in range(k)
    )
    return (
        f"__bloom_words AS (SELECT pos // 63 AS word, "
        f"bit_or(1::BIGINT << (pos % 63)::INT) AS bits "
        f"FROM ({build_bits}) GROUP BY pos // 63)",
        checks,
    )

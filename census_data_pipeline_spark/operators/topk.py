"""Sorts / top-k (reference: examples/multi_state_comparison.py:88,112-124).

``top_k`` compiles to TakeOrderedAndProject — a true distributed top-k
(per-partition heap + driver merge), NOT a full sort; at 100 TB this reads
everything once and moves only k rows per partition.

pandas ``nlargest`` keeps first-encountered rows on ties
(SURVEY.md §7.3 risk); every top-k here takes an explicit deterministic
tiebreak key so results are stable and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(by: str, ascending: bool, tiebreak: list[str] | None) -> list[Column]:
    main = F.col(by).asc() if ascending else F.col(by).desc()
    return [main] + [F.col(t).asc() for t in (tiebreak or [])]


def top_k(
    df: DataFrame,
    by: str,
    k: int,
    ascending: bool = False,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """``nlargest(k, by)`` equivalent (reference:
    examples/multi_state_comparison.py:112)."""
    return df.orderBy(*_order(by, ascending, tiebreak)).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    by: str,
    k: int,
    ascending: bool = False,
    tiebreak: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k within each group — the natural windowed extension of T1
    (SURVEY.md §2.5): row_number over (partition by group, order by metric).
    One shuffle on the group key; no global sort."""
    w = Window.partitionBy(*group_cols).orderBy(*_order(by, ascending, tiebreak))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def full_sort(df: DataFrame, by: str, ascending: bool = False) -> DataFrame:
    """``sort_values`` equivalent (reference:
    examples/multi_state_comparison.py:88). Range-partitioned distributed
    sort; prefer top_k when a limit follows."""
    return df.orderBy(F.col(by).asc() if ascending else F.col(by).desc())

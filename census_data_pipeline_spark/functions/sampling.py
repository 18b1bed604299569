"""Deterministic hash-based sampling (LLM-data-pipeline tier, SURVEY.md
§2.11 ⊕; not in the reference, which always processes full tables).

Why not ``df.sample()``: RNG sampling is neither reproducible across
engines (no oracle) nor stable across retries/partition reshuffles at
scale. Hashing a key column gives a sample that is deterministic, cheap
(narrow, codegen-fused, no shuffle), consistent across engines, and
*monotone*: the p=5% sample is a strict subset of the p=20% sample, which
is exactly what progressive corpus scaling runs want.

Mechanics: keep a row iff the first byte of ``md5(key)`` is below
``num``/256. Lowercase fixed-width hex compares identically as a string
in every engine, so the predicate is just ``substr(md5(k),1,2) < '%02x'``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_byte(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 2)


def _threshold_hex(num: int) -> str:
    """2-char comparison literal for num/256. num=256 needs a sentinel
    above every hex pair — ``'100'`` would compare LEXICOGRAPHICALLY
    ('ff' < '100' is false as strings), so use 'zz'."""
    if not 0 <= num <= 256:
        raise ValueError("num must be in [0, 256]")
    return "zz" if num == 256 else f"{num:02x}"


def hash_sample(df: DataFrame, key_col: str, num: int, den: int = 256) -> DataFrame:
    """Keep ~``num``/``den`` of rows, chosen by hash of ``key_col``.

    ``den`` must be 256 (one hash byte) — coarser fractions keep the
    predicate a single string compare. Sampling is by KEY: all rows with
    the same key are kept or dropped together (stable for multi-row
    entities).
    """
    if den != 256:
        raise ValueError("den must be 256 (one md5 byte)")
    return df.filter(_hash_byte(F.col(key_col)) < F.lit(_threshold_hex(num)))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, int],
    default_num: int = 0,
) -> DataFrame:
    """Per-stratum hash sampling: ``fractions`` maps stratum value ->
    num/256 keep-rate; unlisted strata use ``default_num``. One narrow
    filter, no shuffle — the downsample-hot-classes / upweight-rare-classes
    primitive of corpus curation."""
    threshold: Column = F.lit(_threshold_hex(default_num))
    for value, num in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(num))
        ).otherwise(threshold)
    return df.filter(_hash_byte(F.col(key_col)) < threshold)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    hash order (md5 of the order key, id tiebreak) — the source-balancing
    primitive of corpus curation: hot sources are truncated to the cap,
    rare sources pass through whole. Hash order makes the kept subset a
    uniform draw that is stable across engines and runs; one shuffle on
    the group key."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        _hash_byte(F.col(order_col)), F.col(order_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )

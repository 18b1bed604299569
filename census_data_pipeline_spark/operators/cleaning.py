"""Missing-value cleaning (reference: src/transformers.py:30-72).

The reference encodes missing census values as large negative sentinel codes
(transformers.py:30-36) and offers three strategies (transformers.py:42-72):
``nan`` (sentinel -> NaN), ``fill`` (then fillna), ``drop`` (then dropna).
Spark's NULL plays the NaN role; everything compiles to ``when`` expressions
so the whole pass stays inside whole-stage codegen — no UDFs, no extra scan.

Scale: a pure narrow transformation — no shuffle, fully pipelined with the
parquet scan; at 100 TB this adds ~zero cost over the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Census sentinel codes for missing/suppressed data
# (reference: src/transformers.py:30-36).
MISSING_CODES: tuple[int, ...] = (
    -666666666,
    -999999999,
    -888888888,
    -222222222,
    -333333333,
)

_NUMERIC_TYPES = {"int", "bigint", "double", "float", "decimal", "smallint", "tinyint"}


def _numeric_columns(df: DataFrame) -> list[str]:
    # match on the base type name — a prefix test would also catch
    # interval types ("interval day" startswith "int")
    return [c for c, t in df.dtypes if t.split("(")[0] in _NUMERIC_TYPES]


def sentinel_to_null(col: Column | str) -> Column:
    """Sentinel code -> NULL for one column (reference: transformers.py:62-63)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*MISSING_CODES), F.lit(None)).otherwise(c)


def clean_missing_values(
    df: DataFrame,
    columns: list[str] | None = None,
    strategy: str = "nan",
    fill_value: float = 0.0,
) -> DataFrame:
    """Replicate ``DataTransformer.clean_missing_values``
    (reference: src/transformers.py:42-72) on a lazy DataFrame.

    strategy: ``nan`` -> sentinels become NULL; ``fill`` -> then
    ``fillna(fill_value)`` on those columns; ``drop`` -> then drop rows with
    any NULL in those columns.
    """
    if strategy not in ("nan", "fill", "drop"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    cols = columns if columns is not None else _numeric_columns(df)
    out = df.withColumns({c: sentinel_to_null(c) for c in cols})
    if strategy == "fill":
        out = out.na.fill(fill_value, subset=cols)
    elif strategy == "drop":
        out = out.na.drop(subset=cols)
    return out


def coerce_numeric(df: DataFrame, columns: list[str]) -> DataFrame:
    """``pd.to_numeric(errors="coerce")`` equivalent
    (reference: src/census_pipeline.py:361-363): unparseable strings become
    NULL. Spark's non-ANSI cast has the same contract; we trim first so
    whitespace-padded API values parse the same way pandas parses them.
    """
    return df.withColumns(
        {c: F.trim(F.col(c)).cast("double") for c in columns}
    )

"""Rate / derived-demographics operators (reference: src/transformers.py:74-150).

``calculate_rates`` computes ``numerator / denominator * per`` with an
explicit zero-denominator policy. The reference relies on pandas semantics
(x/0 -> inf, then policy-replaced, transformers.py:100-108); Spark's
non-ANSI division yields NULL on /0, so each policy is an explicit ``when``:

- ``nan``  -> NULL on zero or null denominator (Spark default behaviour)
- ``zero`` -> 0.0 on zero denominator
- ``inf``  -> signed infinity on zero denominator (pandas' raw behaviour)

All pure column expressions — codegen'd, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZERO_POLICIES = ("nan", "zero", "inf")


def safe_rate(
    numerator: Column | str,
    denominator: Column | str,
    per: float = 100.0,
    handle_zero: str = "nan",
) -> Column:
    """One rate column (reference: src/transformers.py:74-111)."""
    if handle_zero not in ZERO_POLICIES:
        raise ValueError(f"handle_zero must be one of {ZERO_POLICIES}")
    num = F.col(numerator) if isinstance(numerator, str) else numerator
    den = F.col(denominator) if isinstance(denominator, str) else denominator
    rate = num / den * F.lit(per)
    if handle_zero == "nan":
        return rate  # x/0 and x/NULL are already NULL in (non-ANSI) Spark
    if handle_zero == "zero":
        # pandas parity (transformers.py:100-108): the reference computes the
        # raw division first (0/0 -> NaN, x/0 -> ±inf) and replaces only
        # [inf, -inf] with 0 — so 0/0 stays NaN under the 'zero' policy too.
        return (
            F.when((den == 0) & (num == 0), F.lit(float("nan")))
            .when(den == 0, F.lit(0.0))
            .otherwise(rate)
        )
    # 'inf': reproduce raw pandas float division (transformers.py:100-101):
    # +inf for positive numerator, -inf negative, NaN for 0/0.
    return (
        F.when((den == 0) & (num > 0), F.lit(float("inf")))
        .when((den == 0) & (num < 0), F.lit(float("-inf")))
        .when((den == 0) & (num == 0), F.lit(float("nan")))
        .otherwise(rate)
    )


def calculate_rates(
    df: DataFrame,
    rate_definitions: dict[str, tuple[str, str]],
    per: float = 100.0,
    handle_zero: str = "nan",
) -> DataFrame:
    """Batch form: ``{rate_name: (numerator_col, denominator_col)}``
    (reference: src/transformers.py:74-111 loops one pair; the engine takes
    the natural batch)."""
    return df.withColumns(
        {
            name: safe_rate(num, den, per=per, handle_zero=handle_zero)
            for name, (num, den) in rate_definitions.items()
        }
    )


# Derived-demographics recipes (reference: src/transformers.py:113-150):
# each is rate(numerator, denominator, per=100) applied only when both source
# columns are present in the frame.
DEMOGRAPHIC_RECIPES: dict[str, tuple[str, str]] = {
    "pct_white": ("white_population", "total_population"),
    "pct_black": ("black_population", "total_population"),
    "pct_hispanic": ("hispanic_population", "total_population"),
    "poverty_rate": ("poverty_population", "poverty_universe"),
    "unemployment_rate": ("unemployed", "labor_force"),
}


def derive_demographics(
    df: DataFrame,
    recipes: dict[str, tuple[str, str]] | None = None,
    handle_zero: str = "nan",
) -> DataFrame:
    """Apply every recipe whose source columns exist
    (reference: src/transformers.py:113-150, presence checks per recipe)."""
    recipes = recipes if recipes is not None else DEMOGRAPHIC_RECIPES
    present = set(df.columns)
    applicable = {
        name: (num, den)
        for name, (num, den) in recipes.items()
        if num in present and den in present
    }
    return calculate_rates(df, applicable, per=100.0, handle_zero=handle_zero)


def sum_columns(df: DataFrame, output_col: str, columns: list[str]) -> DataFrame:
    """Row-wise sum of columns (reference: examples/tract_level_analysis.py:88-92,
    college_educated = bachelors+masters+doctorate)."""
    expr = F.lit(0.0)
    for c in columns:
        expr = expr + F.col(c)
    return df.withColumn(output_col, expr)

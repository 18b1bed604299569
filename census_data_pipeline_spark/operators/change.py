"""Temporal change between two snapshots (reference: src/transformers.py:233-277).

Inner equi-join of period t1 vs t2 on the key, suffixed columns, absolute
change ``t2 - t1`` and percent change ``(t2-t1)/t1*100`` with the reference's
±inf -> null cleanup (transformers.py:273-275) expressed directly as a
zero-denominator guard.

Scale: a single sort-merge (or AQE-chosen) equi-join on the key; when the two
periods come from the same partitioned lake the join is co-partitioned and
shuffle-free under bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calculate_change(
    df1: DataFrame,
    df2: DataFrame,
    variable: str,
    join_on: str = "GEOID",
    period1_label: str = "t1",
    period2_label: str = "t2",
) -> DataFrame:
    """Reference: ``DataTransformer.calculate_change``
    (src/transformers.py:233-277). Output columns:
    ``<join_on>, <var>_<t1>, <var>_<t2>, <var>_change, <var>_pct_change``."""
    c1 = f"{variable}_{period1_label}"
    c2 = f"{variable}_{period2_label}"
    left = df1.select(join_on, F.col(variable).alias(c1))
    right = df2.select(join_on, F.col(variable).alias(c2))
    joined = left.join(right, on=join_on, how="inner")
    change = F.col(c2) - F.col(c1)
    # pandas: (t2-t1)/t1 -> ±inf when t1==0, then replaced with NaN
    # (transformers.py:273-275); Spark /0 is already NULL — same net result,
    # made explicit here for readability.
    pct = F.when(F.col(c1) == 0, F.lit(None)).otherwise(
        change / F.col(c1) * F.lit(100.0)
    )
    return joined.withColumn(f"{variable}_change", change).withColumn(
        f"{variable}_pct_change", pct
    )

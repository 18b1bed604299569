"""Weighted composite index (reference: src/transformers.py:190-231).

``create_index``: optionally min-max normalize each component, then the
weighted sum with weights normalized to sum to 1
(transformers.py:218-227). The normalization stats for *all* components are
computed in ONE aggregate pass + one broadcast cross join — the reference
does one full-table pass per component; at 100 TB that difference is
N extra scans vs zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def create_index(
    df: DataFrame,
    components: list[str],
    weights: list[float] | None = None,
    normalize: bool = True,
    output_col: str = "composite_index",
) -> DataFrame:
    if weights is None:
        weights = [1.0] * len(components)
    if len(weights) != len(components):
        raise ValueError("weights must match components length")
    total = float(sum(weights))
    norm_weights = [w / total for w in weights]

    if normalize:
        aggs = []
        for comp in components:
            aggs.append(F.min(comp).alias(f"__lo_{comp}"))
            aggs.append(F.max(comp).alias(f"__hi_{comp}"))
        stats = df.agg(*aggs)
        df = df.crossJoin(F.broadcast(stats))
        terms = [
            (F.col(comp) - F.col(f"__lo_{comp}"))
            / (F.col(f"__hi_{comp}") - F.col(f"__lo_{comp}"))
            * F.lit(w)
            for comp, w in zip(components, norm_weights)
        ]
        drop = [f"__{b}_{c}" for c in components for b in ("lo", "hi")]
    else:
        terms = [F.col(comp) * F.lit(w) for comp, w in zip(components, norm_weights)]
        drop = []

    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    return df.withColumn(output_col, expr).drop(*drop)

"""GEOID string algebra (reference: src/geography.py:219-269,
src/census_pipeline.py:367-378, src/transformers.py:301-312).

The census key space is hierarchical and prefix-structured:
state[0:2] + county[2:5] + tract[5:11] + block_group[11:12]. Everything here
is concat/substring column expressions, which means:

- rollups to a coarser level are ``groupBy(substring(GEOID, 1, N))`` — a
  plain hash aggregate with map-side partial aggregation;
- at 100 TB, partitioning the lake by ``substring(GEOID,1,2)`` (state) gives
  partition pruning for any state-scoped query *and* co-locates every
  prefix rollup (state/county/tract are all prefixes of the partition key),
  so hierarchy rollups shuffle nothing across states.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference: src/transformers.py:301-306
GEOID_LENGTHS: dict[str, int] = {
    "state": 2,
    "county": 5,
    "tract": 11,
    "block group": 12,
    "block_group": 12,
}

# slice offsets, reference: src/geography.py:219-240 (parse_geoid)
_PARTS = (
    ("state", 1, 2),
    ("county", 3, 3),
    ("tract", 6, 6),
    ("block_group", 12, 1),
)


def create_geoid(
    df: DataFrame,
    geography: str,
    state_col: str = "state",
    county_col: str = "county",
    tract_col: str = "tract",
    block_group_col: str = "block group",
) -> DataFrame:
    """Concat FIPS part columns into GEOID by level
    (reference: src/census_pipeline.py:367-378)."""
    parts_by_level = {
        "state": [state_col],
        "county": [state_col, county_col],
        "tract": [state_col, county_col, tract_col],
        "block group": [state_col, county_col, tract_col, block_group_col],
        "block_group": [state_col, county_col, tract_col, block_group_col],
    }
    if geography not in parts_by_level:
        raise ValueError(f"unsupported geography: {geography!r}")
    return df.withColumn(
        "GEOID", F.concat(*[F.col(c) for c in parts_by_level[geography]])
    )


def build_geoid(state: str, county: str = "", tract: str = "", block_group: str = "") -> str:
    """Scalar GEOID builder.

    Deliberate strictness upgrade over the reference: src/geography.py:243-269
    concatenates the raw parts verbatim (``build_geoid('6','59')`` -> ``'659'``),
    which silently produces non-canonical GEOIDs when callers pass unpadded
    FIPS codes. This builder zero-pads every part to its fixed Census width
    (state 2, county 3, tract 6 with the '.' separator stripped) so the output
    always satisfies the fixed-offset contract that ``parse_geoid`` and the
    prefix rollups rely on."""
    geoid = state.zfill(2)
    if county:
        geoid += county.zfill(3)
        if tract:
            geoid += tract.replace(".", "").zfill(6)
            if block_group:
                geoid += block_group
    return geoid


def parse_geoid(geoid: str) -> dict[str, str]:
    """Scalar parse by fixed offsets (reference: src/geography.py:219-240)."""
    out: dict[str, str] = {}
    if len(geoid) >= 2:
        out["state"] = geoid[:2]
    if len(geoid) >= 5:
        out["county"] = geoid[2:5]
    if len(geoid) >= 11:
        out["tract"] = geoid[5:11]
    if len(geoid) >= 12:
        out["block_group"] = geoid[11:12]
    return out


def parse_geoid_columns(df: DataFrame, geoid_col: str = "GEOID") -> DataFrame:
    """Column form of parse_geoid: adds state/county/tract/block_group
    columns (NULL where the GEOID is too short for that level)."""
    g = F.col(geoid_col)
    cols: dict[str, Column] = {}
    for name, pos, length in _PARTS:
        cols[name] = F.when(
            F.length(g) >= pos + length - 1, F.substring(g, pos, length)
        ).otherwise(F.lit(None))
    return df.withColumns(cols)


def geoid_prefix(geoid_col: str, target_geography: str) -> Column:
    """Prefix slice used by hierarchical rollups
    (reference: src/transformers.py:312)."""
    n = GEOID_LENGTHS.get(target_geography)
    if n is None:
        raise ValueError(f"unsupported target geography: {target_geography!r}")
    return F.substring(F.col(geoid_col), 1, n)

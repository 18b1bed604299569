"""Fuzzy record linkage: distance-1 name matching via wildcard blocking.

Census-bureau-flavored extension surface (the reference joins records only
on exact GEOID equality, src/census_pipeline.py:270-272; real linkage work
needs approximate name matching). The all-pairs ``levenshtein(a, b) <= 1``
join is quadratic; the scalable relational form is *neighborhood blocking*:

  1. for every row, generate one variant per character position with that
     position wildcarded (``abc`` -> ``*bc a*c ab*``) — a narrow explode,
  2. self equi-join on (position, variant): two names that differ in
     exactly one substitution share exactly one variant (so the join also
     needs no distinct pass),
  3. verify the survivors with ``levenshtein``.

Every stage is a scan or a hash shuffle on a compact key — the same
explode/bucket/verify shape as the minhash LSH dedup (functions/dedup.py).
Substitution-only blocking is exact for equal-length identifiers (census
GEOIDs, fixed-format record ids); insert/delete neighbors would add
deletion variants, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit1_pairs(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """All pairs (id_a < id_b) whose names differ by exactly one
    substitution. Output: (id_a, id_b, name_a, name_b)."""
    c = F.col("name")
    variants = df.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("name")
    ).select(
        "id",
        "name",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(c)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat(
                        c.substr(F.lit(1), i - 1),
                        F.lit("*"),
                        c.substr(i + 1, F.length(c)),
                    ).alias("variant"),
                ),
            )
        ).alias("v"),
    ).select("id", "name", "v.pos", "v.variant")

    a, b = variants.alias("a"), variants.alias("b")
    return (
        a.join(b, on=["pos", "variant"])
        .filter(F.col("a.id") < F.col("b.id"))
        # names sharing a wildcard slot and unequal => levenshtein == 1;
        # the check stays as the verification step of the block-verify
        # pattern (and drops exact-duplicate names if ids differ)
        .filter(F.levenshtein(F.col("a.name"), F.col("b.name")) == 1)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
    )

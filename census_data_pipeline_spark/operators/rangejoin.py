"""Interval (range) join: pair each left row with every right row whose
timestamp lands inside a bounded window around the left timestamp.

Not in the reference — its only temporal operator is the batch snapshot
change join (src/transformers.py:233-277). This is extension surface per
SURVEY.md §2.3 ("range, as-of" joins), and the standard event-correlation
primitive in a training-data pipeline (e.g. pair a click with the errors
that surround it).

Scale design — the banded equi-join: a naive formulation
``l JOIN r ON keys AND r.ts BETWEEN l.ts+lo AND l.ts+hi`` degenerates in
Spark to a shuffle join on the equi keys followed by a per-key
nested-loop filter, which is quadratic in the hot-key row count (skewed
users at 100 TB). Instead both sides are bucketed on
``floor(ts / (hi-lo))``: each right row belongs to exactly ONE bucket,
each left row's window covers at most TWO adjacent buckets, so the join
is a plain hash equi-join on (keys…, bucket) — linear shuffle, AQE
skew-splittable — with the exact BETWEEN applied as a post-filter. No
dedup pass is needed precisely because right rows map to a single bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_us: int = 0,
    upper_us: int = 0,
    payload_prefix: str = "r_",
) -> DataFrame:
    """Inner interval join: emit (left row, right row) for every pair with
    ``right_ts`` in ``[left_ts + lower_us, left_ts + upper_us]`` (bounds in
    microseconds, inclusive) sharing the ``on`` keys. Right payload columns
    are carried with ``payload_prefix`` to keep names collision-free.
    """
    if upper_us < lower_us:
        raise ValueError("upper_us must be >= lower_us")
    width = max(upper_us - lower_us, 1)

    payload_cols = [c for c in right.columns if c not in on]
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # Epoch micros (~1.7e15) are far below 2^53, so double floor-division
    # is exact here; right rows land in exactly one band.
    lo_bucket = F.floor((l_us + F.lit(lower_us)) / F.lit(float(width)))
    hi_bucket = F.floor((l_us + F.lit(upper_us)) / F.lit(float(width)))
    l_banded = left.withColumn("__lus", l_us).withColumn(
        "__bucket", F.explode(F.sequence(lo_bucket, hi_bucket))
    )
    r_banded = right.select(
        *on,
        *[F.col(c).alias(f"{payload_prefix}{c}") for c in payload_cols],
        r_us.alias("__rus"),
        F.floor(r_us / F.lit(float(width))).alias("__bucket"),
    )

    return (
        l_banded.join(r_banded, on=[*on, "__bucket"])
        .filter(
            (F.col("__rus") >= F.col("__lus") + F.lit(lower_us))
            & (F.col("__rus") <= F.col("__lus") + F.lit(upper_us))
        )
        .drop("__bucket", "__lus", "__rus")
    )

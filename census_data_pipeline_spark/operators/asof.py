"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2.3 "not present" row; standard in time-series engines).

For each left row, attach the payload of the latest right row with
``right_ts <= left_ts`` within the same key group (backward as-of, ties
included — matching DuckDB/pandas ``merge_asof`` defaults).

Implementation is the scalable union+window form, NOT a per-key
``merge_asof`` UDF: tag both sides, union, one window over
(keys, ts, side) carrying the last non-null right payload forward, then
keep left rows. Cost: one shuffle on the keys + a per-partition sort —
the same shape as any windowed aggregate, no skew beyond the key
distribution, no driver-side work. (The applyInPandas/merge_asof
alternative ships whole groups through Arrow; this form stays JVM-side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of left join. Right payload columns (everything except
    keys and timestamp) come back prefixed with ``payload_prefix``; a
    ``<prefix>ts`` column carries the matched right timestamp. Left rows
    with no earlier right row keep NULL payloads."""
    left_extra = [c for c in left.columns if c not in (*on, left_ts)]
    payload_cols = [c for c in right.columns if c not in (*on, right_ts)]
    carried = [f"{payload_prefix}{c}" for c in payload_cols]
    ts_out = f"{payload_prefix}ts"
    out_cols = [*on, "__ts", "__src", left_ts, *left_extra, "__asof"]

    # The right payload travels as ONE struct so the whole matched row is
    # carried atomically: per-column last(ignorenulls) would mix values
    # from different right rows whenever the matched row holds a NULL
    # payload field (the struct itself is non-null for every right row,
    # even when its fields are null).
    payload_struct = F.struct(
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    struct_type = (
        right.select(payload_struct.alias("__asof")).schema["__asof"].dataType
    )

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),  # left sorts after right at equal ts
        F.col(left_ts),
        *[F.col(c) for c in left_extra],
        F.lit(None).cast(struct_type).alias("__asof"),
    ).select(*out_cols)

    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extra],
        payload_struct.alias("__asof"),
    ).select(*out_cols)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        "__asof", F.last("__asof", ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("__src") == 1)
        .select(
            *on,
            left_ts,
            *left_extra,
            *[
                F.col(f"__asof.{c}").alias(f"{payload_prefix}{c}")
                for c in payload_cols
            ],
            F.col("__asof.__r_ts").alias(ts_out),
        )
    )

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

from functools import reduce

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


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build (CDC compaction):
    collapse a per-key event stream into validity intervals — one row per
    CHANGE of the tracked attributes, with ``valid_from`` (the change
    timestamp), ``valid_to`` (the next change, NULL while current),
    ``version`` (1-based per key) and ``is_current``. This is the
    standard dimension-table maintenance operation a warehouse runs over
    ingested change feeds, and the inverse of an as-of join (which reads
    such intervals back at a point in time — see operators/asof.py).

    Change detection is null-safe (``IS DISTINCT FROM`` semantics) and
    ordering is made deterministic by ``tiebreak`` columns after the
    timestamp — REQUIRED when timestamps can tie, or the kept row under a
    tie is engine-dependent.

    Scale shape: one shuffle on the key; both windows (lag for change
    detection, lead/row_number for interval stitching) share that
    partitioning, so Catalyst plans a single Exchange and two Window
    nodes over it. Compacts monotonically: output rows = number of
    attribute transitions, never more than input rows."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(t) for t in (tiebreak or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    chg = (
        df.withColumn("__chg", first | changed)
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return chg.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics without a table format: apply a change feed
    (rows tagged ``op`` ∈ {'I','U','D'}) to a snapshot — deletes drop the
    key, inserts/upserts replace it, untouched rows pass through. With
    ``seq_col`` the LATEST change per key wins (deterministic tiebreak on
    the sequence column); otherwise the feed must be pre-deduped per key.

    This is deliberately NOT a full-outer join: the scale shape is

        kept   = snapshot ANTI JOIN touched-keys      (broadcast-able)
        result = kept UNION (latest changes where op != 'D')

    so when the change feed is small relative to the snapshot — the
    normal CDC regime — the snapshot never shuffles at all (AQE
    broadcasts the touched keys into the anti join), where a full-outer
    formulation would exchange both sides on the key unconditionally.
    The change columns (minus op/seq) must match the snapshot schema;
    unionByName keeps the contract explicit."""
    from pyspark.sql import Window

    latest = changes
    if seq_col is not None:
        # seq ties (a malformed feed) resolve deterministically by the
        # remaining columns rather than partition order
        rest = [
            F.col(c).desc() for c in changes.columns
            if c not in (*key_cols, seq_col)
        ]
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), *rest
        )
        latest = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    payload = [
        c for c in latest.columns if c not in (op_col, seq_col)
    ]
    kept = snapshot.join(
        latest.select(*key_cols), on=key_cols, how="left_anti"
    )
    ups = latest.filter(F.col(op_col) != "D").select(*payload)
    return kept.unionByName(ups)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Full-outer diff of two snapshots of the same table: one row per
    key present in EITHER side, classified ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` (null-safe column comparison, so
    NULL -> value and value -> NULL both read as changes) — the
    read-side complement of ``apply_changes``: MERGE applies a feed,
    diff RECOVERS the feed from two snapshots (audit, replication
    verification, regression triage).

    Returns keys + ``change_type`` + per-compared-column ``old_``/
    ``new_`` value pairs.

    Scale: this is the one legitimately full-outer operation in the
    engine — both snapshots shuffle once on the key (unlike MERGE,
    where the feed is small; a diff's output is unbounded on either
    side, so there is no anti-join rewrite). On a bucketed lake
    (sources/bucketing.py) both sides co-locate and the exchange
    disappears — diff is the operator bucketing exists for."""
    compare = compare_cols or [
        c for c in old.columns if c not in keys and c in new.columns
    ]
    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    joined = o.join(n, on=keys, how="full_outer")
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare
        ],
        F.lit(True),
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *keys,
        change_type.alias("change_type"),
        *[c for pair in (
            (f"old_{x}", f"new_{x}") for x in compare
        ) for c in pair],
    )

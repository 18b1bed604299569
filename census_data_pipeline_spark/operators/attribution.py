"""Marketing-touch attribution over the event stream: for every
conversion, find the FIRST and LAST qualifying touch inside a lookback
horizon and credit the conversion's value to that touch's channel —
the first-touch / last-touch models every growth-analytics stack runs.

Scale shape: conversions and touches are two filtered scans of the same
events table; the candidate join is user-keyed (equi-join on user_id)
with the lookback horizon as a range predicate, so per-user work is
bounded by touches-within-horizon × conversions — the horizon is the
lever that keeps a years-long power user from going quadratic (same
bounded-interval discipline as operators/rangejoin.py). Touch selection
is ``min_by``/``max_by`` over a (ts, event_id) struct — deterministic
under timestamp ties — in ONE groupBy per conversion; no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback: str = "7 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-conversion attribution rows: (conversion id, user, value,
    first_touch_type, last_touch_type). Conversions with no qualifying
    touch in the horizon are attributed to NULL (kept, not dropped —
    'organic' conversions are the baseline every model reports)."""
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        F.col(value_col).alias("value"),
    )
    touch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("__tu"),
        F.col(ts_col).alias("__tts"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("__tt"),
    )
    # horizon predicate INSIDE the left join: a user whose touches all
    # fall outside the lookback must still keep the conversion (as a
    # NULL-attributed row), same as a user with no touches at all
    cond = (
        (F.col("__u") == F.col("__tu"))
        & (F.col("__tts") <= F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.expr(f"INTERVAL {lookback}"))
    )
    joined = conv.join(touch, cond, "left")
    key = F.struct(F.col("__tts"), F.col("__tid"))
    return (
        joined.groupBy(
            "conversion_id", F.col("__u").alias("user_id"), "value"
        )
        .agg(
            F.min_by("__tt", key).alias("first_touch_type"),
            F.max_by("__tt", key).alias("last_touch_type"),
        )
    )


def session_paths(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    gap_minutes: int = 5,
    depth: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-k session OPENING paths — the journey-mining companion to
    the attribution first/last-touch split: sessionize by inactivity
    gap (the ``events_session_5m`` convention), take each session's
    first ``depth`` event types in order, concatenate with '>', and
    rank paths by frequency. "view>click>purchase vs
    view>view>view" is the canonical product question neither a funnel
    (fixed target sequence) nor a transition matrix (memoryless) can
    answer. Returns exactly the top ``k`` rows (path, n_sessions)
    under the TOTAL order (n_sessions DESC, path ASC) — the
    deterministic tie-break both engines share.

    Scale shape: the sessionizing windows are PARTITIONED BY user (a
    user's history is bounded — the sessionization precedent), the
    path build is one groupBy over (user, session) with an in-group
    sort of ≤ depth elements, and the final ranking is one
    grouped count + TakeOrderedAndProject (never a full sort).
    Ordering ties beyond (ts, type) are harmless: identical rows
    produce identical path elements. Cite: reference has no journey
    tier; extends SURVEY §2.11 beside touch_attribution."""
    from pyspark.sql import Window

    d = df.na.drop(subset=[ts_col, user_col, type_col]).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).cast("string").alias("__t"),
    )
    w = Window.partitionBy("__u").orderBy("__ts", "__t")
    gap_us = gap_minutes * 60 * 1_000_000
    f = d.select(
        "__u", "__ts", "__t",
        F.when(
            F.lag("__ts").over(w).isNull()
            | (
                F.unix_micros("__ts")
                - F.unix_micros(F.lag("__ts").over(w))
                >= gap_us
            ),
            1,
        ).otherwise(0).alias("__new"),
    )
    g = f.select(
        "__u", "__ts", "__t",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__sid"),
    )
    r = g.select(
        "__u", "__sid", "__t",
        F.row_number().over(
            Window.partitionBy("__u", "__sid").orderBy("__ts", "__t")
        ).alias("__rn"),
    ).filter(F.col("__rn") <= depth)
    paths = r.groupBy("__u", "__sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rn", "__t"))),
                lambda x: x["__t"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


def session_paths_oracle_sql(
    table: str,
    ts_sql: str,
    user_sql: str,
    type_sql: str,
    gap_minutes: int = 5,
    depth: int = 3,
    k: int = 20,
) -> str:
    """DuckDB replica of ``session_paths`` — identical sessionization,
    in-session ranking, concatenation, and total-order top-k."""
    return f"""WITH spf AS (
      SELECT {user_sql} AS u, {ts_sql} AS ts,
             CAST({type_sql} AS VARCHAR) AS t,
             CASE WHEN lag({ts_sql}) OVER w IS NULL
                  OR {ts_sql} - lag({ts_sql}) OVER w
                     >= INTERVAL '{gap_minutes} minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM {table}
      WHERE ({ts_sql}) IS NOT NULL AND ({user_sql}) IS NOT NULL
        AND ({type_sql}) IS NOT NULL
      WINDOW w AS (PARTITION BY {user_sql}
                   ORDER BY {ts_sql}, CAST({type_sql} AS VARCHAR))),
    spg AS (
      SELECT *, sum(new_s) OVER (PARTITION BY u ORDER BY ts, t
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM spf),
    spr AS (
      SELECT *, row_number() OVER (PARTITION BY u, sid
                                   ORDER BY ts, t) AS rn
      FROM spg),
    spp AS (
      SELECT u, sid, string_agg(t, '>' ORDER BY rn) AS path
      FROM spr WHERE rn <= {depth} GROUP BY u, sid)
    SELECT path, count(*) AS n_sessions
    FROM spp GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {k}"""

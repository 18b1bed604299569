"""Survival analysis: the Kaplan-Meier product-limit estimator
(SURVEY.md §2.11 ⊕ — retention / time-to-event analytics: "how long
until a user converts, with the non-converted correctly censored", the
question naive conversion-rate rollups answer wrongly).

Scale shape: ONE per-key aggregation builds the duration table (data
scale), then everything happens on the GROUPED duration frame — one row
per distinct duration, which is horizon-bounded by construction when
durations are bucketed (hours/days), NOT data-scale. The running
at-risk count and survival product are windows over that stats-sized
frame — the engine's no-unpartitioned-data-scale-window rule does not
apply to aggregate-sized frames (same reasoning as the drift CDFs).
The product is computed as exp(Σ ln(1−d/n)) so an ANSI-SQL oracle runs
the identical op sequence (SQL has no product window aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# floor for a survival factor when every remaining subject exits at one
# time (1 - d/n == 0): ln(0) is null in Spark and -inf in DuckDB, so both
# engines substitute this identical constant instead
_ZERO_FLOOR = 1e-12


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Kaplan-Meier estimator over a (duration, observed) frame:
    ``observed`` = 1 when the event happened at ``duration``, 0 when the
    subject was censored then. Returns one row per distinct duration:
    (duration, n_risk, n_events, n_censored, survival), survival rounded
    to 6 dp.

    Conventions (the standard ones): subjects censored at t remain in
    the risk set for events at t; S(t) multiplies (1 − d_u/n_u) over all
    event times u ≤ t. Durations should be pre-bucketed coarsely enough
    that the distinct-duration frame is horizon-bounded — the windows
    below run on THAT frame, never on the subject-level data."""
    dur = F.col(duration_col)
    g = durations.groupBy(dur.alias("duration")).agg(
        F.sum(F.col(observed_col).cast("long")).alias("n_events"),
        F.sum(F.lit(1) - F.col(observed_col).cast("long"))
        .alias("n_censored"),
    )
    total = durations.agg(F.count("*").alias("__n"))
    w_prior = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_upto = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("__n")
        - F.coalesce(
            F.sum(F.col("n_events") + F.col("n_censored")).over(w_prior),
            F.lit(0),
        ),
    )
    frac = F.lit(1.0) - F.col("n_events") / F.col("n_risk").cast("double")
    factor = F.when(frac <= 0, F.log(F.lit(_ZERO_FLOOR))).otherwise(
        F.log(frac)
    )
    return r.select(
        "duration",
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_events",
        "n_censored",
        F.round(F.exp(F.sum(factor).over(w_upto)), 6).alias("survival"),
    )


def kaplan_meier_oracle_sql(durations_cte: str) -> str:
    """DuckDB replica of ``kaplan_meier``: ``durations_cte`` must define
    a CTE named ``dur`` with columns (duration, observed)."""
    return f"""
    WITH {durations_cte},
    g AS (SELECT duration,
                 CAST(sum(observed) AS BIGINT) AS n_events,
                 CAST(sum(1 - observed) AS BIGINT) AS n_censored
          FROM dur GROUP BY duration),
    t AS (SELECT count(*) AS n FROM dur),
    r AS (SELECT duration, n_events, n_censored,
                 (SELECT n FROM t) - coalesce(
                   sum(n_events + n_censored) OVER (
                     ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS n_risk
          FROM g)
    SELECT duration,
           CAST(n_risk AS BIGINT) AS n_risk,
           n_events, n_censored,
           round(exp(sum(
             CASE WHEN 1.0 - n_events / CAST(n_risk AS DOUBLE) <= 0
                  THEN ln({_ZERO_FLOOR!r})
                  ELSE ln(1.0 - n_events / CAST(n_risk AS DOUBLE)) END)
             OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             6) AS survival
    FROM r
    """

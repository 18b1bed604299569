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


def kaplan_meier_grouped(
    durations: DataFrame,
    group_col: str = "cohort",
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Per-cohort Kaplan-Meier curves: ``kaplan_meier`` partitioned by
    ``group_col`` — one survival curve per cohort, computed in one plan.
    Returns (cohort, duration, n_risk, n_events, n_censored, survival).

    Scale shape mirrors the ungrouped form: one data-scale groupBy
    builds the (cohort, duration) frame — |cohorts| × |distinct
    durations| rows, horizon-bounded — plus a cohort-totals frame
    joined in (broadcast; cohorts are few). The running windows are
    PARTITIONED by cohort over that aggregate-sized frame."""
    dur = F.col(duration_col)
    g = durations.groupBy(
        F.col(group_col).alias("cohort"), dur.alias("duration")
    ).agg(
        F.sum(F.col(observed_col).cast("long")).alias("n_events"),
        F.sum(F.lit(1) - F.col(observed_col).cast("long"))
        .alias("n_censored"),
    )
    totals = durations.groupBy(F.col(group_col).alias("cohort")).agg(
        F.count("*").alias("__n")
    )
    w_prior = Window.partitionBy("cohort").orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_upto = Window.partitionBy("cohort").orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.join(F.broadcast(totals), "cohort").withColumn(
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
        "cohort",
        "duration",
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_events",
        "n_censored",
        F.round(F.exp(F.sum(factor).over(w_upto)), 6).alias("survival"),
    )


def kaplan_meier_grouped_oracle_sql(durations_cte: str) -> str:
    """DuckDB replica of ``kaplan_meier_grouped``: ``durations_cte``
    must define a CTE named ``dur`` with (cohort, duration, observed)."""
    return f"""
    WITH {durations_cte},
    g AS (SELECT cohort, duration,
                 CAST(sum(observed) AS BIGINT) AS n_events,
                 CAST(sum(1 - observed) AS BIGINT) AS n_censored
          FROM dur GROUP BY cohort, duration),
    t AS (SELECT cohort, count(*) AS n FROM dur GROUP BY cohort),
    r AS (SELECT g.cohort, g.duration, g.n_events, g.n_censored,
                 t.n - coalesce(
                   sum(g.n_events + g.n_censored) OVER (
                     PARTITION BY g.cohort ORDER BY g.duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS n_risk
          FROM g JOIN t ON t.cohort = g.cohort)
    SELECT cohort, duration,
           CAST(n_risk AS BIGINT) AS n_risk,
           n_events, n_censored,
           round(exp(sum(
             CASE WHEN 1.0 - n_events / CAST(n_risk AS DOUBLE) <= 0
                  THEN ln({_ZERO_FLOOR!r})
                  ELSE ln(1.0 - n_events / CAST(n_risk AS DOUBLE)) END)
             OVER (PARTITION BY cohort ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             6) AS survival
    FROM r
    """


# χ²(1) critical value at α = 0.05 — the standard two-cohort log-rank
# significance threshold; identical literal in the SQL oracle
_CHI2_1DF_95 = 3.841458820694124


def logrank_test(
    durations: DataFrame,
    group_col: str = "cohort",
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Two-cohort log-rank test (Mantel-Haenszel): are two survival
    curves different? Returns ONE row: (cohort_a, cohort_b, observed_a,
    expected_a, chi2, significant) where cohort_a is the
    lexicographically smaller label, expected_a = Σ_t d_t·n_at/n_t,
    var = Σ_t d_t·(n_at/n_t)·(1−n_at/n_t)·(n_t−d_t)/(n_t−1), and
    chi2 = (O_a−E_a)²/var tested against the χ²(1) 95% critical value.

    The computation runs entirely on a TIME-GRID frame of
    |distinct durations| × 2 rows (horizon-bounded, never data-scale):
    distinct exit times × cohorts, left-joined with per-(cohort, time)
    exits, cumulative-window at-risk counts per cohort, then one final
    1-row aggregate over event times. Convention: subjects censored AT t
    remain at risk for events at t (the ``kaplan_meier`` risk-set
    rule)."""
    labels = [
        r[0]
        for r in durations.select(F.col(group_col)).distinct()
        .orderBy(group_col).limit(3).collect()
    ]
    if len(labels) != 2:
        raise ValueError(
            f"logrank_test is two-cohort; got {len(labels)} distinct "
            f"labels {labels[:3]}"
        )
    a_label = labels[0]
    times = durations.select(
        F.col(duration_col).alias("duration")
    ).distinct()
    cohorts = durations.select(
        F.col(group_col).alias("cohort")
    ).distinct()
    grid = times.crossJoin(cohorts)
    exits = durations.groupBy(
        F.col(group_col).alias("cohort"),
        F.col(duration_col).alias("duration"),
    ).agg(
        F.sum(F.col(observed_col).cast("long")).alias("d"),
        F.count("*").alias("x"),
    )
    totals = durations.groupBy(F.col(group_col).alias("cohort")).agg(
        F.count("*").alias("n0")
    )
    w_prior = Window.partitionBy("cohort").orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    per = (
        grid.join(exits, ["cohort", "duration"], "left")
        .fillna(0, ["d", "x"])
        .join(F.broadcast(totals), "cohort")
        .withColumn(
            "n_risk",
            F.col("n0") - F.coalesce(F.sum("x").over(w_prior), F.lit(0)),
        )
    )
    t = (
        per.groupBy("duration")
        .agg(
            F.sum("d").alias("d_t"),
            F.sum("n_risk").alias("n_t"),
            F.sum(F.when(F.col("cohort") == F.lit(a_label), F.col("d"))
                  .otherwise(F.lit(0))).alias("d_at"),
            F.sum(F.when(F.col("cohort") == F.lit(a_label),
                         F.col("n_risk"))
                  .otherwise(F.lit(0))).alias("n_at"),
        )
        .filter(F.col("d_t") > 0)
    )
    p = F.col("n_at") / F.col("n_t").cast("double")
    stats = t.agg(
        F.sum("d_at").alias("observed_a"),
        F.sum(F.col("d_t") * p).alias("expected_a"),
        F.sum(
            F.when(
                F.col("n_t") > 1,
                F.col("d_t") * p * (F.lit(1.0) - p)
                * (F.col("n_t") - F.col("d_t"))
                / (F.col("n_t") - F.lit(1)).cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("var_a"),
    )
    chi2 = F.when(
        F.col("var_a") > 0,
        (F.col("observed_a") - F.col("expected_a")) ** 2 / F.col("var_a"),
    ).otherwise(F.lit(0.0))
    return stats.select(
        F.lit(str(a_label)).alias("cohort_a"),
        F.lit(str(labels[1])).alias("cohort_b"),
        F.col("observed_a").cast("long").alias("observed_a"),
        F.round("expected_a", 6).alias("expected_a"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(_CHI2_1DF_95)).alias("significant"),
    )


def logrank_oracle_sql(durations_cte: str) -> str:
    """DuckDB replica of ``logrank_test``: ``durations_cte`` must define
    a CTE named ``dur`` with (cohort, duration, observed) and exactly
    two cohort labels."""
    return f"""
    WITH {durations_cte},
    lab AS (SELECT min(cohort) AS a, max(cohort) AS b FROM dur),
    times AS (SELECT DISTINCT duration FROM dur),
    cohorts AS (SELECT DISTINCT cohort FROM dur),
    grid AS (SELECT t.duration, c.cohort FROM times t CROSS JOIN cohorts c),
    ex AS (SELECT cohort, duration,
                  CAST(sum(observed) AS BIGINT) AS d,
                  count(*) AS x
           FROM dur GROUP BY cohort, duration),
    tot AS (SELECT cohort, count(*) AS n0 FROM dur GROUP BY cohort),
    per AS (SELECT g.cohort, g.duration,
                   coalesce(ex.d, 0) AS d,
                   tot.n0 - coalesce(
                     sum(coalesce(ex.x, 0)) OVER (
                       PARTITION BY g.cohort ORDER BY g.duration
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS n_risk
            FROM grid g
            LEFT JOIN ex ON ex.cohort = g.cohort
                        AND ex.duration = g.duration
            JOIN tot ON tot.cohort = g.cohort),
    t AS (SELECT p.duration,
                 sum(p.d) AS d_t,
                 sum(p.n_risk) AS n_t,
                 sum(CASE WHEN p.cohort = (SELECT a FROM lab)
                          THEN p.d ELSE 0 END) AS d_at,
                 sum(CASE WHEN p.cohort = (SELECT a FROM lab)
                          THEN p.n_risk ELSE 0 END) AS n_at
          FROM per p GROUP BY p.duration
          HAVING sum(p.d) > 0),
    s AS (SELECT sum(d_at) AS observed_a,
                 sum(d_t * (n_at / CAST(n_t AS DOUBLE))) AS expected_a,
                 sum(CASE WHEN n_t > 1 THEN
                       d_t * (n_at / CAST(n_t AS DOUBLE))
                           * (1.0 - n_at / CAST(n_t AS DOUBLE))
                           * (n_t - d_t) / CAST(n_t - 1 AS DOUBLE)
                     ELSE 0.0 END) AS var_a
          FROM t)
    SELECT (SELECT CAST(a AS VARCHAR) FROM lab) AS cohort_a,
           (SELECT CAST(b AS VARCHAR) FROM lab) AS cohort_b,
           CAST(observed_a AS BIGINT) AS observed_a,
           round(expected_a, 6) AS expected_a,
           round(CASE WHEN var_a > 0
                 THEN (observed_a - expected_a) * (observed_a - expected_a)
                      / var_a ELSE 0.0 END, 6) AS chi2,
           CASE WHEN var_a > 0
                AND (observed_a - expected_a) * (observed_a - expected_a)
                    / var_a > {_CHI2_1DF_95!r}
                THEN TRUE ELSE FALSE END AS significant
    FROM s
    """


def nelson_aalen(
    durations: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator over the same
    (duration, observed) frame as ``kaplan_meier`` — the hazard-side
    twin of the survival curve (Nelson 1972, Aalen 1978):
    H(t) = Σ_{u ≤ t} d_u/n_u, with the variance estimate
    Σ d_u/n_u² and the Fleming–Harrington survival exp(−H(t)) that
    beats KM in small risk sets. Reading hazard INCREMENTS directly is
    what KM can't give: a flat S(t) stretch hides whether risk paused
    or subjects ran out; d_u/n_u says which. Returns one row per
    distinct duration: (duration, n_risk, n_events, n_censored,
    hazard_inc, cum_hazard, var_hazard, survival_fh), 6-dp rounded.

    Conventions match ``kaplan_meier`` exactly: censored-at-t subjects
    stay in the risk set for events at t, durations pre-bucketed so
    the distinct-duration frame is horizon-bounded — the cumulative
    windows run on THAT frame, never on subject-level data (the KM
    scale discipline, one data-scale agg upstream). Cite: reference
    has no survival tier; extends SURVEY §2.11 beside kaplan_meier."""
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
    nr = F.col("n_risk").cast("double")
    inc = F.col("n_events") / nr
    vinc = F.col("n_events") / (nr * nr)
    cum = F.sum(inc).over(w_upto)
    return r.select(
        "duration",
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_events",
        "n_censored",
        F.round(inc, 6).alias("hazard_inc"),
        F.round(cum, 6).alias("cum_hazard"),
        F.round(F.sum(vinc).over(w_upto), 6).alias("var_hazard"),
        F.round(F.exp(-cum), 6).alias("survival_fh"),
    )


def nelson_aalen_oracle_sql(durations_cte: str) -> str:
    """DuckDB replica of ``nelson_aalen``: ``durations_cte`` must define
    a CTE named ``dur`` with columns (duration, observed) — identical
    risk-set windows and hazard arithmetic as the engine."""
    return f"""
    WITH {durations_cte},
    nag AS (SELECT duration,
                 CAST(sum(observed) AS BIGINT) AS n_events,
                 CAST(sum(1 - observed) AS BIGINT) AS n_censored
          FROM dur GROUP BY duration),
    nat AS (SELECT count(*) AS n FROM dur),
    nar AS (SELECT duration, n_events, n_censored,
                 (SELECT n FROM nat) - coalesce(
                   sum(n_events + n_censored) OVER (
                     ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS n_risk
          FROM nag)
    SELECT duration,
           CAST(n_risk AS BIGINT) AS n_risk,
           n_events, n_censored,
           round(n_events / CAST(n_risk AS DOUBLE), 6) AS hazard_inc,
           round(sum(n_events / CAST(n_risk AS DOUBLE))
             OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS cum_hazard,
           round(sum(n_events / (CAST(n_risk AS DOUBLE)
                                 * CAST(n_risk AS DOUBLE)))
             OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS var_hazard,
           round(exp(-sum(n_events / CAST(n_risk AS DOUBLE))
             OVER (ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             6) AS survival_fh
    FROM nar
    """

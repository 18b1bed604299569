"""Time-series forecasting: additive Holt-Winters (triple exponential
smoothing) over regularly bucketed per-key series (SURVEY.md §2.11 ⊕ —
the events family's missing BI staple, VERDICT r6 #9: "what will next
day's hourly volume look like", with level + trend + daily seasonality).

Scale shape (the EWMA / rolling-median discipline): the data-scale work
is ONE hash aggregation to time buckets; each key's bucketed series is
HORIZON-BOUNDED (e.g. hours over the corpus time span — thousands of
values, never data-scale), so collecting it into a per-key array and
folding the smoothing recursion with Catalyst's ``aggregate`` is
bounded-memory per key and embarrassingly parallel across keys. No
window over data-scale rows, no driver-side state.

FP discipline: level, trend, and each seasonal are rounded to 6 dp at
every step via floor(x·1e6 + 0.5)/1e6 — NOT round() (see ``_r6``) —
and the init means are computed with the identical left folds in both
engines, so the DuckDB oracle (a per-key recursive CTE walking the same
rounded trajectory) matches exactly, converged or not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _r6(c: Column) -> Column:
    """6-dp half-up rounding as floor(x·1e6 + 0.5)/1e6 — identical IEEE
    double ops in Spark and DuckDB, so the rounded trajectories CANNOT
    diverge. ``F.round``/SQL ``round`` are NOT engine-portable here:
    the smoothing recursion's values (6-dp state × decimal constants)
    land on exact half-way cases at the 7th digit almost every step,
    where Spark rounds the shortest decimal repr (BigDecimal.valueOf)
    and DuckDB rounds the exact binary double — measured divergence on
    every events key (the Benford integer-cents trick, generalized)."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def holt_winters_forecast(
    series: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    m: int = 24,
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    horizon: int = 24,
) -> DataFrame:
    """Additive Holt-Winters forecast per key over a REGULAR series
    (one row per consecutive bucket; gap-fill upstream — see
    ``events_gapfill_1h``). Returns (keys..., h, forecast) for
    h = 1..``horizon``.

    Standard additive recursion with season length ``m``::

        l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
        s_t = γ(y_t − l_t) + (1−γ)s_{t−m}
        ŷ_{T+h} = l_T + h·b_T + s_{T+h−m·⌈h/m⌉}

    Deterministic init from the first two seasons (keys with fewer than
    2m buckets are dropped): l₀ = mean(y₁..y_m), b₀ = (mean of season 2
    − mean of season 1)/m, s₀ᵢ = yᵢ − l₀; the recursion then consumes
    y_{m+1}..y_n. The seasonal state is kept as a ROTATING array whose
    head is always s_{t−m}, so no index arithmetic leaks into the fold.
    Every state component is rounded to 6 dp per step (oracle parity).

    The fold runs as one Catalyst ``aggregate`` over the per-key array
    — horizon-bounded, JVM-side, no UDF."""
    if m < 2:
        raise ValueError("season length m must be >= 2")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    a, b, g = float(alpha), float(beta), float(gamma)
    arr = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(time_col).alias("t"),
                                    F.col(value_col).alias("y")))
        ),
        lambda s: s["y"].cast("double"),
    )
    per_key = (
        series.groupBy(*key_cols)
        .agg(arr.alias("__ys"))
        .filter(F.size("__ys") >= 2 * m)
    )

    def lsum(xs: Column) -> Column:
        # left fold from 0.0 — FP-identical to DuckDB list_reduce's
        # first-element seed because 0.0 + x == x exactly
        return F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x)

    s1 = F.slice(F.col("__ys"), 1, m)
    s2 = F.slice(F.col("__ys"), m + 1, m)
    l0 = _r6(lsum(s1) / F.lit(float(m)))
    b0 = _r6((lsum(s2) / F.lit(float(m)) - lsum(s1) / F.lit(float(m)))
             / F.lit(float(m)))
    init = per_key.select(
        *key_cols, "__ys",
        l0.alias("__l0"), b0.alias("__b0"),
        F.transform(s1, lambda x: _r6(x - l0)).alias("__s0"),
    )
    rest = F.slice(
        F.col("__ys"), m + 1, F.size("__ys") - m
    )

    def step(acc: Column, y: Column) -> Column:
        snext = F.element_at(acc["s"], 1)
        l1 = _r6(F.lit(a) * (y - snext)
                 + F.lit(1.0 - a) * (acc["l"] + acc["b"]))
        b1 = _r6(F.lit(b) * (l1 - acc["l"]) + F.lit(1.0 - b) * acc["b"])
        sn = _r6(F.lit(g) * (y - l1) + F.lit(1.0 - g) * snext)
        return F.struct(
            l1.alias("l"), b1.alias("b"),
            F.concat(F.slice(acc["s"], 2, m - 1), F.array(sn)).alias("s"),
        )

    state = F.aggregate(
        rest,
        F.struct(F.col("__l0").alias("l"), F.col("__b0").alias("b"),
                 F.col("__s0").alias("s")),
        step,
    )
    fc = F.transform(
        F.sequence(F.lit(1), F.lit(horizon)),
        lambda h: _r6(
            state["l"] + h.cast("double") * state["b"]
            + F.element_at(state["s"],
                           ((h - 1) % F.lit(m) + 1).cast("int"))
        ),
    )
    return (
        init.select(*key_cols, F.posexplode(fc).alias("__p", "forecast"))
        .select(
            *key_cols,
            (F.col("__p") + 1).cast("long").alias("h"),
            "forecast",
        )
    )


def holt_winters_oracle_sql(
    series_cte: str,
    key: str = "event_type",
    m: int = 24,
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    horizon: int = 24,
) -> str:
    """DuckDB replica of ``holt_winters_forecast``: ``series_cte`` must
    define a CTE named ``series`` with columns (key, t, y) where t is
    the 1-based consecutive bucket index per key and y is DOUBLE. The
    recursion is a per-key RECURSIVE CTE walking the identical 6-dp
    trajectory (list state, head = s_{t−m}, rotate per step)."""
    sa, sb, sg = repr(float(alpha)), repr(float(beta)), repr(float(gamma))
    ca, cb, cg = (repr(1.0 - float(alpha)), repr(1.0 - float(beta)),
                  repr(1.0 - float(gamma)))
    fm = repr(float(m))

    def R(expr: str) -> str:
        # the engine's _r6: floor-based half-up — see its docstring for
        # why SQL round() is not engine-portable here
        return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"

    l1 = R(f"{sa} * (ys[t + 1] - s[1]) + {ca} * (l + b)")
    return f"""
    WITH RECURSIVE {series_cte},
    pk AS (SELECT {key}, list(y ORDER BY t) AS ys,
                  count(*) AS n
           FROM series GROUP BY {key}
           HAVING count(*) >= {2 * m}),
    ini AS (SELECT {key}, ys, n,
                   {R(f"list_reduce(ys[1:{m}], (p, q) -> p + q) / {fm}")}
                     AS l0,
                   {R(f"(list_reduce(ys[{m + 1}:{2 * m}], (p, q) -> p + q)"
                      f" / {fm}"
                      f" - list_reduce(ys[1:{m}], (p, q) -> p + q)"
                      f" / {fm}) / {fm}")} AS b0
            FROM pk),
    r AS (
      SELECT {key}, ys, n, CAST({m} AS BIGINT) AS t, l0 AS l, b0 AS b,
             list_transform(ys[1:{m}], x -> {R("x - l0")}) AS s
      FROM ini
      UNION ALL
      SELECT {key}, ys, n, t + 1,
             {l1},
             {R(f"{sb} * ({l1} - l) + {cb} * b")},
             list_append(s[2:{m}],
               {R(f"{sg} * (ys[t + 1] - {l1}) + {cg} * s[1]")})
      FROM r WHERE t < n),
    fin AS (SELECT {key}, l, b, s FROM r WHERE t = n)
    SELECT {key}, CAST(h AS BIGINT) AS h,
           {R(f"l + h * b + s[((h - 1) % {m}) + 1]")} AS forecast
    FROM fin CROSS JOIN range(1, {horizon + 1}) t(h)
    """


def holt_winters_backtest(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    m: int = 24,
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    horizon: int = 24,
) -> DataFrame:
    """Holdout accuracy for ``holt_winters_forecast``: per key, train on
    the series MINUS its last ``horizon`` buckets, forecast the held-out
    tail, and join forecasts to actuals. ``t_col`` must be the 1-based
    consecutive bucket index per key (the oracle-generator contract).
    Returns (keys..., h, forecast, actual, abs_err) — the
    model-evaluation row a mix-building pipeline thresholds on before
    trusting a forecast for capacity planning (the ``ann_quality_lsh``
    discipline: a trained operator ships with its accuracy contract).

    Scale shape: the cutoff frame is one per-key aggregate broadcast
    back; training and actual slices are filters of the bucketed series
    (aggregate-sized); the fold itself is ``holt_winters_forecast``."""
    cutoff = series.groupBy(*key_cols).agg(
        (F.max(t_col) - horizon).alias("__cut")
    )
    with_cut = series.join(F.broadcast(cutoff), key_cols)
    train = with_cut.filter(F.col(t_col) <= F.col("__cut")).drop("__cut")
    fc = holt_winters_forecast(
        train, key_cols, t_col, value_col, m=m, alpha=alpha, beta=beta,
        gamma=gamma, horizon=horizon,
    )
    actual = with_cut.filter(F.col(t_col) > F.col("__cut")).select(
        *key_cols,
        (F.col(t_col) - F.col("__cut")).cast("long").alias("h"),
        F.col(value_col).cast("double").alias("actual"),
    )
    return fc.join(actual, [*key_cols, "h"]).select(
        *key_cols, "h", "forecast", "actual",
        _r6(F.abs(F.col("forecast") - F.col("actual"))).alias("abs_err"),
    )


def holt_winters_conformal(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    m: int = 24,
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    horizon: int = 24,
    coverage: float = 0.8,
) -> DataFrame:
    """SPLIT-CONFORMAL prediction bands for the Holt-Winters forecast
    (Vovk's inductive conformal prediction, the distribution-free
    interval the capacity-planning consumer actually needs): calibrate
    on the per-key holdout |errors| from ``holt_winters_backtest``, take
    the ⌈(H+1)·coverage⌉-th smallest as the conformal radius q̂ (capped
    at H — the finite-sample-valid order statistic, an INTEGER index so
    both engines pick the identical error, no percentile
    interpolation), then band the full-series forward forecast at ± q̂.

    Returns (keys..., h, forecast, lo, hi, qhat). Keys whose series are
    too short for the backtest (under 2m+horizon buckets) drop out —
    no calibration, no interval, by design.

    Scale shape: the backtest (two smoothing folds over horizon-bounded
    per-key series) plus a row_number window over the H-row-per-key
    calibration frame (aggregate-sized) and one broadcast join of the
    1-row-per-key radius onto the forward forecast."""
    if not 0.0 < coverage < 1.0:
        raise ValueError("coverage must be in (0, 1)")
    bt = holt_winters_backtest(
        series, key_cols, t_col, value_col, m=m, alpha=alpha, beta=beta,
        gamma=gamma, horizon=horizon,
    )
    win = Window.partitionBy(*key_cols).orderBy("abs_err", "h")
    hn = bt.groupBy(*key_cols).agg(F.count("*").alias("__hn"))
    ranked = (
        bt.select(*key_cols, "h", "abs_err")
        .withColumn("__rk", F.row_number().over(win))
        .join(F.broadcast(hn), key_cols)
    )
    q = ranked.filter(
        F.col("__rk")
        == F.least(
            F.ceil((F.col("__hn") + 1) * F.lit(float(coverage)))
            .cast("long"),
            F.col("__hn"),
        )
    ).select(*key_cols, F.col("abs_err").alias("qhat"))
    fc = holt_winters_forecast(
        series, key_cols, t_col, value_col, m=m, alpha=alpha, beta=beta,
        gamma=gamma, horizon=horizon,
    )
    return fc.join(F.broadcast(q), key_cols).select(
        *key_cols, "h", "forecast",
        _r6(F.col("forecast") - F.col("qhat")).alias("lo"),
        _r6(F.col("forecast") + F.col("qhat")).alias("hi"),
        "qhat",
    )


def holt_winters_mase(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    m: int = 24,
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    horizon: int = 24,
) -> DataFrame:
    """MASE (Hyndman & Koehler 2006) for the Holt-Winters holdout — the
    scale-free skill score that answers the question the raw backtest
    can't: IS THE MODEL BETTER THAN THE SEASONAL-NAIVE BASELINE?
    Numerator: the per-key mean |error| of ``holt_winters_backtest``'s
    held-out forecasts. Denominator: the in-sample seasonal-naive MAE
    on the TRAIN slice (mean |y_t − y_{t−m}| for t > m up to the
    cutoff) — the standard m-step naive scaling. MASE < 1 means the
    model beats repeating last season; NULL when the naive MAE is 0
    (a perfectly periodic train series).

    Returns (keys..., mae_model, mae_naive, mase), all 6-dp
    floor-rounded (the engine-portable convention of this module, with
    mase computed FROM the rounded MAEs so both engines agree).

    Scale shape: the backtest fold plus one self-join of the bucketed
    train series shifted by m — both aggregate-sized frames; nothing
    data-scale beyond the hourly agg that built ``series``."""
    bt = holt_winters_backtest(
        series, key_cols, t_col, value_col, m=m, alpha=alpha, beta=beta,
        gamma=gamma, horizon=horizon,
    )
    mae_model = bt.groupBy(*key_cols).agg(
        _r6(F.avg("abs_err")).alias("mae_model")
    )
    cutoff = series.groupBy(*key_cols).agg(
        (F.max(t_col) - horizon).alias("__cut")
    )
    train = (
        series.join(F.broadcast(cutoff), key_cols)
        .filter(F.col(t_col) <= F.col("__cut"))
        .select(
            *key_cols, F.col(t_col).alias("__t"),
            F.col(value_col).cast("double").alias("__y"),
        )
    )
    prev = train.select(
        *key_cols, (F.col("__t") + m).alias("__t"),
        F.col("__y").alias("__yprev"),
    )
    mae_naive = (
        train.join(prev, [*key_cols, "__t"])
        .groupBy(*key_cols)
        .agg(_r6(F.avg(F.abs(F.col("__y") - F.col("__yprev"))))
             .alias("mae_naive"))
    )
    return mae_model.join(mae_naive, key_cols).select(
        *key_cols, "mae_model", "mae_naive",
        F.when(
            F.col("mae_naive") > 0,
            _r6(F.col("mae_model") / F.col("mae_naive")),
        ).otherwise(F.lit(None).cast("double")).alias("mase"),
    )


def _ar_phi_frame(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    p: int,
) -> DataFrame:
    """Shared Yule–Walker fit: per key (≥ 2p buckets), the sorted value
    array, its 6-dp mean, and the AR(p) coefficients from the
    Levinson–Durbin walk — the (keys..., __ys, __mu, __phi) frame
    ``ar_forecast`` and ``ar_ljung_box`` both start from."""
    arr = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(t_col).alias("t"),
                                    F.col(value_col).alias("y")))
        ),
        lambda s: s["y"].cast("double"),
    )
    per_key = (
        series.groupBy(*key_cols)
        .agg(arr.alias("__ys"))
        .filter(F.size("__ys") >= 2 * p)
    )

    def lsum(xs: Column) -> Column:
        return F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x)

    n = F.size("__ys")
    mu = _r6(lsum(F.col("__ys")) / n.cast("double"))
    with_mu = per_key.select(*key_cols, "__ys", mu.alias("__mu"))
    # cs[i] = c_{i-1} (1-based array of lags 0..p), biased /n estimator
    cs = F.transform(
        F.sequence(F.lit(0), F.lit(p)),
        lambda k: _r6(
            lsum(
                F.zip_with(
                    F.slice(F.col("__ys"), 1, F.size("__ys") - k),
                    F.slice(F.col("__ys"), k + 1, F.size("__ys") - k),
                    lambda x, z: (x - F.col("__mu")) * (z - F.col("__mu")),
                )
            )
            / F.size("__ys").cast("double")
        ),
    )
    with_cs = with_mu.select(*key_cols, "__ys", "__mu", cs.alias("__cs"))

    # Levinson–Durbin: state (a: coefficients so far, e: prediction
    # error variance); reflection coefficient 0 when e <= 0 (constant
    # or perfectly-predicted series) keeps the walk deterministic.
    def lev_step(acc: Column, k: Column) -> Column:
        a, e = acc["a"], acc["e"]
        dot = F.aggregate(
            F.filter(F.sequence(F.lit(1), k), lambda j: j < k),
            F.lit(0.0),
            lambda s, j: s
            + F.element_at(a, j) * F.element_at(F.col("__cs"), k - j + 1),
        )
        lam = F.when(
            e > 0, _r6((F.element_at(F.col("__cs"), k + 1) - dot) / e)
        ).otherwise(F.lit(0.0))
        a1 = F.concat(
            F.transform(
                F.filter(F.sequence(F.lit(1), k), lambda j: j < k),
                lambda j: _r6(
                    F.element_at(a, j) - lam * F.element_at(a, k - j)
                ),
            ),
            F.array(lam),
        )
        return F.struct(
            a1.alias("a"), _r6(e * (F.lit(1.0) - lam * lam)).alias("e")
        )

    phi = F.aggregate(
        F.sequence(F.lit(1), F.lit(p)),
        F.struct(
            F.array().cast("array<double>").alias("a"),
            F.element_at(F.col("__cs"), 1).alias("e"),
        ),
        lev_step,
    )["a"]
    return with_cs.select(*key_cols, "__ys", "__mu", phi.alias("__phi"))


def ar_forecast(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    p: int = 24,
    horizon: int = 24,
) -> DataFrame:
    """AR(p) forecast per key by CLOSED-FORM Yule–Walker (VERDICT r9
    #5): biased autocovariances c_0..c_p from the mean-centered series,
    the Toeplitz system solved by the Levinson–Durbin recursion (the
    standard O(p²) closed-form walk — p scalar/vector steps, no matrix
    inverse), then the multi-step AR recursion ŷ_{T+h} = ȳ +
    Σ_j φ_j·(ỹ_{T+h−j} − ȳ) feeding its own forecasts forward.
    Returns (keys..., h, forecast) for h = 1..``horizon`` — the same
    contract as ``holt_winters_forecast`` so MASE can referee the two.

    Keys with fewer than 2p buckets are dropped (same guard class as
    HW's 2m). Degenerate steps are deterministic, not NaN: a constant
    series (c_0 = 0) or a step where the prediction-error variance
    hits 0 takes reflection coefficient 0 — both engines walk the same
    branch. Every scalar is rounded to 6 dp per step (``_r6``), so the
    DuckDB oracle (per-key recursive CTEs walking the identical
    Levinson and forecast trajectories) matches exactly.

    Scale shape: identical to Holt-Winters — ONE hash agg upstream
    builds the bucketed series; everything here is per-key Catalyst
    ``aggregate`` folds over horizon-bounded arrays (p+1 covariance
    sums, p Levinson steps, ``horizon`` forecast steps), JVM-side, no
    UDF, no window over data-scale rows."""
    if p < 1:
        raise ValueError("p must be >= 1")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    with_phi = _ar_phi_frame(series, key_cols, t_col, value_col, p)

    # multi-step recursion over the centered tail (last p train values)
    tail0 = F.transform(
        F.slice(F.col("__ys"), F.size("__ys") - p + 1, p),
        lambda x: _r6(x - F.col("__mu")),
    )

    def fc_step(acc: Column, _h: Column) -> Column:
        tail = acc["tail"]
        pred = _r6(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(p)),
                F.lit(0.0),
                lambda s, j: s
                + F.element_at(F.col("__phi"), j)
                * F.element_at(tail, p + 1 - j),
            )
        )
        return F.struct(
            F.concat(F.slice(tail, 2, p - 1), F.array(pred)).alias("tail"),
            F.concat(acc["out"],
                     F.array(_r6(F.col("__mu") + pred))).alias("out"),
        )

    out = F.aggregate(
        F.sequence(F.lit(1), F.lit(horizon)),
        F.struct(
            tail0.alias("tail"),
            F.array().cast("array<double>").alias("out"),
        ),
        fc_step,
    )["out"]
    return (
        with_phi.select(*key_cols, F.posexplode(out).alias("__p", "forecast"))
        .select(
            *key_cols,
            (F.col("__p") + 1).cast("long").alias("h"),
            "forecast",
        )
    )


def _oracle_r6(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def _ar_fit_ctes_sql(series_cte: str, key: str, p: int) -> str:
    """The shared Yule–Walker fit as DuckDB CTE text — series grouping,
    6-dp mean, autocovariance list, the Levinson recursive CTE, and the
    final ``aphi`` (key, ys, n, mu, phi) relation both AR oracles
    continue from (the ``_ar_phi_frame`` replica)."""
    R = _oracle_r6
    # the recursive step builds state k+1 from state k: the reflection
    # coefficient lamv is computed in a subquery from the PREVIOUS row
    # (a has k entries, e is the step-k error variance), with the new
    # step index spelled k+1 throughout
    lam = (
        "CASE WHEN e > 0 THEN "
        + R(
            "(cs[lk + 2] - CASE WHEN lk = 0 THEN 0.0 ELSE "
            "list_reduce(list_transform(generate_series(1, lk), "
            "j -> a[j] * cs[lk - j + 2]), (x, y) -> x + y) END) / e"
        )
        + " ELSE 0.0 END"
    )
    return f"""
    WITH RECURSIVE {series_cte},
    apk AS (SELECT {key}, list(y ORDER BY t) AS ys, count(*) AS n
            FROM series GROUP BY {key}
            HAVING count(*) >= {2 * p}),
    amu AS (SELECT {key}, ys, n,
                   {R("list_reduce(ys, (x, y) -> x + y) / n")} AS mu
            FROM apk),
    acs AS (SELECT {key}, ys, n, mu,
                   list_transform(generate_series(0, {p}), k ->
                     {R("list_reduce(list_transform("
                        "generate_series(1, CAST(n - k AS BIGINT)), i -> "
                        "(ys[CAST(i AS BIGINT)] - mu) * "
                        "(ys[CAST(i + k AS BIGINT)] - mu)), "
                        "(x, y) -> x + y) / n")}) AS cs
            FROM amu),
    lev AS (
      SELECT {key}, ys, n, mu, cs, 0 AS lk,
             CAST([] AS DOUBLE[]) AS a, cs[1] AS e
      FROM acs
      UNION ALL
      SELECT {key}, ys, n, mu, cs, lk + 1,
             list_append(
               CASE WHEN lk = 0 THEN CAST([] AS DOUBLE[])
                    ELSE list_transform(generate_series(1, lk),
                      j -> {R("a[j] - lamv * a[lk + 1 - j]")}) END,
               lamv),
             {R("e * (1.0 - lamv * lamv)")}
      FROM (SELECT *, {lam} AS lamv
            FROM lev WHERE lk < {p}) q1),
    aphi AS (SELECT {key}, ys, n, mu, a AS phi FROM lev WHERE lk = {p})"""


def ar_oracle_sql(
    series_cte: str,
    key: str = "event_type",
    p: int = 24,
    horizon: int = 24,
) -> str:
    """DuckDB replica of ``ar_forecast``: ``series_cte`` must define a
    CTE named ``series`` with (key, t, y). Autocovariances as list
    folds, the Levinson walk and the forecast recursion as per-key
    RECURSIVE CTEs stepping the identical 6-dp trajectory."""
    R = _oracle_r6
    pred = R(
        f"list_reduce(list_transform(generate_series(1, {p}), "
        f"j -> phi[j] * tail[{p} + 1 - j]), (x, y) -> x + y)"
    )
    return f"""{_ar_fit_ctes_sql(series_cte, key, p)},
    fc AS (
      SELECT {key}, mu, phi, 0 AS h,
             list_transform(ys[CAST(n - {p} + 1 AS BIGINT):CAST(n AS BIGINT)],
                            x -> {R("x - mu")}) AS tail,
             CAST(NULL AS DOUBLE) AS forecast
      FROM aphi
      UNION ALL
      SELECT {key}, mu, phi, h + 1,
             list_append(tail[2:{p}], {pred}),
             {R(f"mu + ({pred})")}
      FROM fc WHERE h < {horizon})
    SELECT {key}, CAST(h AS BIGINT) AS h, forecast
    FROM fc WHERE h >= 1
    """


def ar_backtest(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    p: int = 24,
    horizon: int = 24,
) -> DataFrame:
    """Holdout accuracy for ``ar_forecast`` — the same protocol as
    ``holt_winters_backtest`` (train = series minus its last
    ``horizon`` buckets via a broadcast per-key cutoff, forecast the
    held-out tail, join to actuals) so the two models' errors are
    measured on IDENTICAL folds. Returns (keys..., h, forecast,
    actual, abs_err)."""
    cutoff = series.groupBy(*key_cols).agg(
        (F.max(t_col) - horizon).alias("__cut")
    )
    with_cut = series.join(F.broadcast(cutoff), key_cols)
    train = with_cut.filter(F.col(t_col) <= F.col("__cut")).drop("__cut")
    fc = ar_forecast(train, key_cols, t_col, value_col, p=p,
                     horizon=horizon)
    actual = with_cut.filter(F.col(t_col) > F.col("__cut")).select(
        *key_cols,
        (F.col(t_col) - F.col("__cut")).cast("long").alias("h"),
        F.col(value_col).cast("double").alias("actual"),
    )
    return fc.join(actual, [*key_cols, "h"]).select(
        *key_cols, "h", "forecast", "actual",
        _r6(F.abs(F.col("forecast") - F.col("actual"))).alias("abs_err"),
    )


def _naive_denominator(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    m: int,
    horizon: int,
) -> DataFrame:
    """Shared MASE denominator: in-sample seasonal-naive MAE on the
    TRAIN slice (mean |y_t − y_{t−m}|, t ≤ cutoff) — one broadcast
    cutoff + one self-join of the bucketed series shifted by m. Every
    model's MASE divides by THIS number, so scores are comparable."""
    cutoff = series.groupBy(*key_cols).agg(
        (F.max(t_col) - horizon).alias("__cut")
    )
    train = (
        series.join(F.broadcast(cutoff), key_cols)
        .filter(F.col(t_col) <= F.col("__cut"))
        .select(
            *key_cols, F.col(t_col).alias("__t"),
            F.col(value_col).cast("double").alias("__y"),
        )
    )
    prev = train.select(
        *key_cols, (F.col("__t") + m).alias("__t"),
        F.col("__y").alias("__yprev"),
    )
    return (
        train.join(prev, [*key_cols, "__t"])
        .groupBy(*key_cols)
        .agg(_r6(F.avg(F.abs(F.col("__y") - F.col("__yprev"))))
             .alias("mae_naive"))
    )


def ar_mase(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    p: int = 24,
    m: int = 24,
    horizon: int = 24,
) -> DataFrame:
    """MASE for the AR(p) holdout — numerator from ``ar_backtest``,
    denominator the SAME in-sample seasonal-naive MAE as
    ``holt_winters_mase`` (scale parameter m), so HW and AR skill
    scores are directly comparable. Returns (keys..., mae_model,
    mae_naive, mase); NULL mase when the train series is perfectly
    m-periodic."""
    bt = ar_backtest(series, key_cols, t_col, value_col, p=p,
                     horizon=horizon)
    mae_model = bt.groupBy(*key_cols).agg(
        _r6(F.avg("abs_err")).alias("mae_model")
    )
    mae_naive = _naive_denominator(series, key_cols, t_col, value_col,
                                   m, horizon)
    return mae_model.join(mae_naive, key_cols).select(
        *key_cols, "mae_model", "mae_naive",
        F.when(
            F.col("mae_naive") > 0,
            _r6(F.col("mae_model") / F.col("mae_naive")),
        ).otherwise(F.lit(None).cast("double")).alias("mase"),
    )


def seasonal_naive_mase(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    m: int = 24,
    horizon: int = 24,
) -> DataFrame:
    """MASE of the seasonal-naive forecaster itself on the SAME holdout
    fold (ŷ_{T+h} = y_{T+h−m} from the train slice; requires
    horizon ≤ m, which the module's m = horizon = 24 defaults satisfy):
    the degenerate baseline every model-selection table needs — if
    nothing beats this row, ship the naive forecast. Returns
    (keys..., mae_model, mae_naive, mase)."""
    if horizon > m:
        raise ValueError("seasonal-naive holdout needs horizon <= m")
    cutoff = series.groupBy(*key_cols).agg(
        (F.max(t_col) - horizon).alias("__cut")
    )
    with_cut = series.join(F.broadcast(cutoff), key_cols)
    fc = with_cut.filter(
        (F.col(t_col) > F.col("__cut") - m)
        & (F.col(t_col) <= F.col("__cut") - m + horizon)
    ).select(
        *key_cols,
        (F.col(t_col) - (F.col("__cut") - m)).cast("long").alias("h"),
        F.col(value_col).cast("double").alias("forecast"),
    )
    actual = with_cut.filter(F.col(t_col) > F.col("__cut")).select(
        *key_cols,
        (F.col(t_col) - F.col("__cut")).cast("long").alias("h"),
        F.col(value_col).cast("double").alias("actual"),
    )
    mae_model = (
        fc.join(actual, [*key_cols, "h"])
        .groupBy(*key_cols)
        .agg(_r6(F.avg(F.abs(F.col("forecast") - F.col("actual"))))
             .alias("mae_model"))
    )
    mae_naive = _naive_denominator(series, key_cols, t_col, value_col,
                                   m, horizon)
    return mae_model.join(mae_naive, key_cols).select(
        *key_cols, "mae_model", "mae_naive",
        F.when(
            F.col("mae_naive") > 0,
            _r6(F.col("mae_model") / F.col("mae_naive")),
        ).otherwise(F.lit(None).cast("double")).alias("mase"),
    )


def forecast_model_select(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    m: int = 24,
    p: int = 24,
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    horizon: int = 24,
) -> DataFrame:
    """Model selection by MASE (VERDICT r9 #5): Holt-Winters vs AR(p)
    vs seasonal-naive, each scored on the IDENTICAL holdout fold with
    the IDENTICAL in-sample naive denominator, long-form one row per
    (key, model) with ``best`` flagging the per-key minimum (ties to
    the lexicographically smallest model name via min(struct), an
    aggregate — no window; NULL-mase rows never win). The table a
    capacity planner reads instead of trusting any single forecaster.

    Scale shape: three already-audited holdout evaluations (per-key
    folds over horizon-bounded arrays) + one per-key min aggregate
    broadcast back."""
    hw = holt_winters_mase(
        series, key_cols, t_col, value_col, m=m, alpha=alpha, beta=beta,
        gamma=gamma, horizon=horizon,
    ).select(*key_cols, F.lit("holt_winters").alias("model"),
             "mae_model", "mae_naive", "mase")
    ar = ar_mase(
        series, key_cols, t_col, value_col, p=p, m=m, horizon=horizon,
    ).select(*key_cols, F.lit("ar").alias("model"),
             "mae_model", "mae_naive", "mase")
    naive = seasonal_naive_mase(
        series, key_cols, t_col, value_col, m=m, horizon=horizon,
    ).select(*key_cols, F.lit("seasonal_naive").alias("model"),
             "mae_model", "mae_naive", "mase")
    # lazily persisted (r14 — VERDICT r13 #1): the winner aggregate AND
    # the final join both consume allm, so the lineage cut + persist
    # stays (without it the three model evaluations and their
    # heavyweight generated code execute twice) — but the winner
    # broadcast, built first at the sink, materializes the blocks, so
    # the r13 eager count was a third full evaluation pass
    from census_data_pipeline_spark.sources.catalog import (
        round_persist,
    )

    allm = round_persist(hw.unionByName(ar).unionByName(naive))
    winner = (
        allm.filter(F.col("mase").isNotNull())
        .groupBy(*key_cols)
        .agg(
            F.min(F.struct(F.col("mase").alias("mase"),
                           F.col("model").alias("model"))).alias("__w")
        )
        .select(*key_cols, F.col("__w.model").alias("__best_model"))
    )
    return allm.join(F.broadcast(winner), key_cols, "left").select(
        *key_cols, "model", "mae_model", "mae_naive", "mase",
        (F.col("model") == F.col("__best_model"))
        .cast("boolean").alias("best"),
    ).select(
        *key_cols, "model", "mae_model", "mae_naive", "mase",
        F.coalesce(F.col("best"), F.lit(False)).alias("best"),
    )


def ar_ljung_box(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    p: int = 24,
    lags: int = 36,
) -> DataFrame:
    """Ljung–Box whiteness test on the AR(p) IN-SAMPLE residuals
    (Ljung & Box 1978) — the diagnostic that closes the AR family: if
    the one-step residuals r_t = y_t − (ȳ + Σ_j φ_j(y_{t−j} − ȳ)) are
    still autocorrelated, the model is underfit and its forecasts
    inherit the structure it missed.

        Q = m(m+2) Σ_{k=1..h} ρ̂_k² / (m−k),   m = n − p residuals

    tested against χ²(h − p) at 95% via the same Wilson–Hilferty cube
    the χ² independence audit uses — closed form, no quantile table.
    Returns (keys..., n_resid, q_stat, df, q_crit, white_noise);
    white_noise NULL when df < 1 (h ≤ p leaves no degrees of freedom).
    Keys need > p + lags buckets (every ρ̂_k must see m > k pairs);
    shorter keys drop. Residuals, autocorrelations, Q, and the
    critical value are all 6-dp floor-rounded (``_r6``), so the DuckDB
    replica walks the identical arithmetic.

    Scale shape: the shared Yule–Walker fit plus three horizon-bounded
    per-key folds (residual transform, lags+1 autocovariance sums, the
    Q sum) — JVM-side Catalyst ``aggregate``s, nothing data-scale."""
    if p < 1:
        raise ValueError("p must be >= 1")
    if lags < 1:
        raise ValueError("lags must be >= 1")
    # lineage barriers on the |keys|-row frames: without them Catalyst's
    # CollapseProject INLINES the fit expressions into every one of the
    # lags+1 autocorrelation references (and those into the Q sum) — an
    # exponentially exploding expression tree that turned this query's
    # sf0.1 run into 107 s of codegen/eval; with barriers it is sub-second
    with_phi = (
        _ar_phi_frame(series, key_cols, t_col, value_col, p)
        .filter(F.size("__ys") > p + lags)
        .localCheckpoint(eager=False)
    )

    def lsum(xs: Column) -> Column:
        return F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x)

    res = F.transform(
        F.sequence(F.lit(p + 1), F.size("__ys")),
        lambda t: _r6(
            F.element_at(F.col("__ys"), t)
            - (
                F.col("__mu")
                + F.aggregate(
                    F.sequence(F.lit(1), F.lit(p)),
                    F.lit(0.0),
                    lambda s, j: s
                    + F.element_at(F.col("__phi"), j)
                    * (F.element_at(F.col("__ys"), t - j) - F.col("__mu")),
                )
            )
        ),
    )
    rframe = with_phi.select(*key_cols, res.alias("__res")) \
        .localCheckpoint(eager=False)
    m = F.size("__res")
    rbar = _r6(lsum(F.col("__res")) / m.cast("double"))
    rframe = rframe.select(*key_cols, "__res", rbar.alias("__rbar"))
    rc = F.transform(
        F.sequence(F.lit(0), F.lit(lags)),
        lambda k: _r6(
            lsum(
                F.zip_with(
                    F.slice(F.col("__res"), 1, F.size("__res") - k),
                    F.slice(F.col("__res"), k + 1, F.size("__res") - k),
                    lambda x, z: (x - F.col("__rbar"))
                    * (z - F.col("__rbar")),
                )
            )
            / F.size("__res").cast("double")
        ),
    )
    cframe = rframe.select(*key_cols, F.size("__res").alias("__m"),
                           rc.alias("__rc")).localCheckpoint(eager=False)
    c0 = F.element_at(F.col("__rc"), 1)
    q = _r6(
        F.col("__m") * (F.col("__m") + 2)
        * F.aggregate(
            F.sequence(F.lit(1), F.lit(lags)),
            F.lit(0.0),
            lambda s, k: s
            + F.pow(
                F.when(c0 > 0,
                       _r6(F.element_at(F.col("__rc"), k + 1) / c0))
                .otherwise(F.lit(0.0)),
                F.lit(2),
            )
            / (F.col("__m") - k).cast("double"),
        )
    )
    df = lags - p
    if df >= 1:
        fdf = float(df)
        crit = round(
            fdf
            * (1.0 - 2.0 / (9.0 * fdf)
               + 1.644854 * (2.0 / (9.0 * fdf)) ** 0.5) ** 3,
            6,
        )
        crit_col = F.lit(crit)
        white = (q <= F.lit(crit)).cast("boolean")
    else:
        crit_col = F.lit(None).cast("double")
        white = F.lit(None).cast("boolean")
    return cframe.select(
        *key_cols,
        F.col("__m").cast("long").alias("n_resid"),
        q.alias("q_stat"),
        F.lit(df).cast("long").alias("df"),
        crit_col.alias("q_crit"),
        white.alias("white_noise"),
    )


def ar_ljung_box_oracle_sql(
    series_cte: str,
    key: str = "event_type",
    p: int = 24,
    lags: int = 36,
) -> str:
    """DuckDB replica of ``ar_ljung_box`` — the shared Yule–Walker fit
    CTEs, then identical residual / autocorrelation / Q arithmetic as
    list folds with the same 6-dp rounding and Wilson–Hilferty cut."""
    R = _oracle_r6
    df = lags - p
    if df >= 1:
        fdf = float(df)
        crit = round(
            fdf
            * (1.0 - 2.0 / (9.0 * fdf)
               + 1.644854 * (2.0 / (9.0 * fdf)) ** 0.5) ** 3,
            6,
        )
        # CAST: DuckDB parses a bare decimal literal as DECIMAL(18,…),
        # which fails the driver's double-vs-decimal schema comparison
        crit_sql = f"CAST({crit!r} AS DOUBLE)"
        white_sql = f"q_stat <= {crit!r}"
    else:
        crit_sql = "CAST(NULL AS DOUBLE)"
        white_sql = "CAST(NULL AS BOOLEAN)"
    resid = R(
        f"ys[CAST(t + {p} AS BIGINT)] - (mu + "
        f"list_reduce(list_transform(generate_series(1, {p}), j -> "
        f"phi[j] * (ys[CAST(t + {p} - j AS BIGINT)] - mu)), "
        f"(x, y) -> x + y))"
    )
    return f"""{_ar_fit_ctes_sql(series_cte, key, p)},
    ares AS (
      SELECT {key},
             list_transform(generate_series(1, CAST(n - {p} AS BIGINT)),
                            t -> {resid}) AS res
      FROM aphi WHERE n > {p + lags}),
    arbar AS (
      SELECT {key}, res, len(res) AS m,
             {R("list_reduce(res, (x, y) -> x + y) / len(res)")} AS rbar
      FROM ares),
    arc AS (
      SELECT {key}, m,
             list_transform(generate_series(0, {lags}), k ->
               {R("list_reduce(list_transform("
                  "generate_series(1, CAST(m - k AS BIGINT)), i -> "
                  "(res[CAST(i AS BIGINT)] - rbar) * "
                  "(res[CAST(i + k AS BIGINT)] - rbar)), "
                  "(x, y) -> x + y) / m")}) AS rc
      FROM arbar),
    aq AS (
      SELECT {key}, m,
             {R(f"m * (m + 2) * list_reduce("
                f"list_transform(generate_series(1, {lags}), k -> "
                f"pow(CASE WHEN rc[1] > 0 THEN "
                + R("rc[CAST(k + 1 AS BIGINT)] / rc[1]")
                + f" ELSE 0.0 END, 2) / (m - k)), (x, y) -> x + y)")}
               AS q_stat
      FROM arc)
    SELECT {key}, CAST(m AS BIGINT) AS n_resid, q_stat,
           CAST({df} AS BIGINT) AS df,
           {crit_sql} AS q_crit,
           {white_sql} AS white_noise
    FROM aq"""


def acf(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    lags: int = 48,
) -> DataFrame:
    """Sample autocorrelation function per key — THE diagnostic a user
    runs BEFORE choosing p for ``ar_forecast`` or a season length for
    Holt-Winters (Box & Jenkins' identification step): r_k = c_k/c_0
    from the biased autocovariances of the bucketed series, for
    k = 1..``lags``, with the ±1.96/√n white-noise band and a
    per-lag significance flag. Returns (keys..., lag, acf, band,
    significant); constant series (c_0 = 0) emit NULL acf with
    significant = false. Keys with fewer than 2·``lags`` buckets drop
    (the 2p guard class).

    Scale shape: ONE hash agg upstream builds the bucketed series;
    here a single groupBy collects each key's horizon-bounded array
    and every autocovariance is a Catalyst ``aggregate`` fold
    (lags+1 sequential sums, JVM-side, no UDF, no window) — identical
    to the fit step ``ar_forecast`` already runs, exposed as its own
    contract. Every scalar rounds via ``_r6`` so the DuckDB oracle's
    list folds walk the identical trajectory. Cite: reference has no
    time-series tier; extends SURVEY §2.11 beside ar_forecast."""
    if lags < 1:
        raise ValueError("lags must be >= 1")
    arr = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(t_col).alias("t"),
                                    F.col(value_col).alias("y")))
        ),
        lambda s: s["y"].cast("double"),
    )
    per_key = (
        series.groupBy(*key_cols)
        .agg(arr.alias("__ys"))
        .filter(F.size("__ys") >= 2 * lags)
    )

    def lsum(xs: Column) -> Column:
        return F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x)

    n = F.size("__ys")
    mu = _r6(lsum(F.col("__ys")) / n.cast("double"))
    with_mu = per_key.select(
        *key_cols, "__ys", n.alias("__n"), mu.alias("__mu")
    )
    cs = F.transform(
        F.sequence(F.lit(0), F.lit(lags)),
        lambda k: _r6(
            lsum(
                F.zip_with(
                    F.slice(F.col("__ys"), 1, F.size("__ys") - k),
                    F.slice(F.col("__ys"), k + 1, F.size("__ys") - k),
                    lambda x, z: (x - F.col("__mu")) * (z - F.col("__mu")),
                )
            )
            / F.size("__ys").cast("double")
        ),
    )
    with_cs = with_mu.select(*key_cols, "__n", cs.alias("__cs"))
    band = _r6(F.lit(1.96) / F.sqrt(F.col("__n").cast("double")))
    r = F.when(
        F.col("__c0") > 0, _r6(F.col("__c") / F.col("__c0"))
    ).otherwise(F.lit(None).cast("double"))
    return (
        with_cs.select(
            *key_cols, "__n",
            F.element_at("__cs", 1).alias("__c0"),
            F.posexplode(F.slice("__cs", 2, lags)).alias("__k", "__c"),
        )
        .select(
            *key_cols,
            (F.col("__k") + 1).cast("long").alias("lag"),
            r.alias("acf"),
            band.alias("band"),
            F.coalesce(F.abs(r) > band, F.lit(False)).alias("significant"),
        )
    )


def acf_oracle_sql(
    series_cte: str,
    key: str = "event_type",
    lags: int = 48,
) -> str:
    """DuckDB replica of ``acf``: the same grouped series list, biased
    autocovariance list folds, r_k = c_k/c_0 and the 1.96/√n band with
    identical ``_r6`` rounding. ``series_cte`` must define a CTE named
    ``series`` with (key, t, y)."""
    R = _oracle_r6
    return f"""WITH {series_cte},
    fpk AS (SELECT {key}, list(y ORDER BY t) AS ys, count(*) AS n
            FROM series GROUP BY {key}
            HAVING count(*) >= {2 * lags}),
    fmu AS (SELECT {key}, ys, n,
                   {R("list_reduce(ys, (x, y) -> x + y) / n")} AS mu
            FROM fpk),
    fcs AS (SELECT {key}, n,
                   list_transform(generate_series(0, {lags}), k ->
                     {R("list_reduce(list_transform("
                        "generate_series(1, CAST(n - k AS BIGINT)), i -> "
                        "(ys[CAST(i AS BIGINT)] - mu) * "
                        "(ys[CAST(i + k AS BIGINT)] - mu)), "
                        "(x, y) -> x + y) / n")}) AS cs
            FROM fmu),
    flg AS (
      SELECT {key}, n, cs, unnest(generate_series(1, {lags})) AS lag
      FROM fcs),
    fr AS (
      SELECT {key}, CAST(lag AS BIGINT) AS lag,
             CASE WHEN cs[1] > 0
                  THEN {R("cs[CAST(lag + 1 AS BIGINT)] / cs[1]")}
                  ELSE NULL END AS acf,
             {R("1.96 / sqrt(CAST(n AS DOUBLE))")} AS band
      FROM flg)
    SELECT {key}, lag, acf, band,
           COALESCE(abs(acf) > band, FALSE) AS significant
    FROM fr"""


# 95% critical value of sup|Brownian bridge| (the Kolmogorov statistic):
# the asymptotic null distribution of max|S_t| / (σ√n) for the centered
# cumulative-sum path of an i.i.d. series.
_CUSUM_CRIT_95 = 1.358099


def changepoint_cusum(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Offline single-changepoint detection per key — the batch twin of
    the streaming CUSUM monitor: over the bucketed series, the centered
    cumulative sum S_t = Σ_{i≤t}(y_i − ȳ) peaks exactly where a mean
    shift happens (Page 1954; the CUSUM estimator t* = argmax|S_t|,
    first index on ties), and max|S_t|/(σ̂√n) converges to the
    sup-|Brownian-bridge| law under no-change, giving the closed-form
    95% significance cut at 1.358099 — no bootstrap, no RNG. Returns
    one row per key: (keys..., n, t_star, stat, mean_before,
    mean_after, delta, significant); constant series (σ̂ = 0) emit
    stat 0 / significant false, and mean_after is NULL when t* = n.
    Keys with fewer than 8 buckets drop.

    Scale shape: ONE hash agg upstream builds the series; here a
    single groupBy collects each key's horizon-bounded array, ONE
    O(n) Catalyst ``aggregate`` fold carries (running sum, best |S|,
    argmax) — JVM-side, sequential, so the raw prefix sums are
    bit-identical to the oracle's left-to-right list folds; rounding
    via ``_r6`` only at comparisons and outputs. No UDF, no window,
    no driver state. Cite: reference has no time-series tier; extends
    SURVEY §2.11 beside streaming cusum_monitor."""
    arr = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(t_col).alias("t"),
                                    F.col(value_col).alias("y")))
        ),
        lambda s: s["y"].cast("double"),
    )
    per_key = (
        series.groupBy(*key_cols)
        .agg(arr.alias("__ys"))
        .filter(F.size("__ys") >= 8)
    )

    def lsum(xs: Column) -> Column:
        return F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x)

    n = F.size("__ys")
    mu = _r6(lsum(F.col("__ys")) / n.cast("double"))
    with_mu = per_key.select(
        *key_cols, "__ys", n.alias("__n"), mu.alias("__mu")
    )
    c0 = _r6(
        lsum(
            F.transform(
                F.col("__ys"),
                lambda x: (x - F.col("__mu")) * (x - F.col("__mu")),
            )
        )
        / F.col("__n").cast("double")
    )

    # one sequential fold: raw running sum (never rounded — addition
    # order matches the oracle's left-to-right list_reduce exactly),
    # best = rounded |S_t|, first strict improvement wins ties
    def step(acc: Column, t: Column) -> Column:
        s1 = acc["s"] + F.element_at(F.col("__ys"), t) - F.col("__mu")
        r = _r6(F.abs(s1))
        better = r > acc["best"]
        return F.struct(
            s1.alias("s"),
            F.when(better, r).otherwise(acc["best"]).alias("best"),
            F.when(better, t).otherwise(acc["bt"]).alias("bt"),
        )

    walk = F.aggregate(
        F.sequence(F.lit(1), F.col("__n")),
        F.struct(
            F.lit(0.0).alias("s"),
            F.lit(-1.0).alias("best"),
            F.lit(0).alias("bt"),
        ),
        step,
    )
    staged = with_mu.select(
        *key_cols, "__ys", "__n",
        c0.alias("__c0"),
        walk["best"].alias("__best"),
        walk["bt"].alias("__bt"),
    )
    sigma = _r6(F.sqrt(F.col("__c0")))
    stat = F.when(
        sigma > 0,
        _r6(
            F.col("__best")
            / (sigma * F.sqrt(F.col("__n").cast("double")))
        ),
    ).otherwise(F.lit(0.0))
    mb = _r6(
        lsum(F.slice("__ys", 1, F.col("__bt")))
        / F.col("__bt").cast("double")
    )
    ma = F.when(
        F.col("__bt") < F.col("__n"),
        _r6(
            lsum(
                F.slice(
                    "__ys", F.col("__bt") + 1, F.col("__n") - F.col("__bt")
                )
            )
            / (F.col("__n") - F.col("__bt")).cast("double")
        ),
    ).otherwise(F.lit(None).cast("double"))
    return staged.select(
        *key_cols,
        F.col("__n").cast("long").alias("n"),
        F.col("__bt").cast("long").alias("t_star"),
        stat.alias("stat"),
        mb.alias("mean_before"),
        ma.alias("mean_after"),
        F.when(ma.isNotNull(), _r6(ma - mb)).alias("delta"),
        (stat > F.lit(_CUSUM_CRIT_95)).alias("significant"),
    )


def changepoint_oracle_sql(
    series_cte: str,
    key: str = "event_type",
) -> str:
    """DuckDB replica of ``changepoint_cusum``: the same grouped series
    list, rounded-|prefix-sum| list (each prefix a left-to-right fold —
    bit-identical to the engine's sequential walk), first-argmax via
    list_position(list_max), and identical stat / before-after / 95%
    cut arithmetic."""
    R = _oracle_r6
    prefix_abs = R(
        "abs(list_reduce(list_transform(generate_series(1, "
        "CAST(t AS BIGINT)), i -> ys[CAST(i AS BIGINT)] - mu), "
        "(x, y) -> x + y))"
    )
    return f"""WITH {series_cte},
    gpk AS (SELECT {key}, list(y ORDER BY t) AS ys, count(*) AS n
            FROM series GROUP BY {key}
            HAVING count(*) >= 8),
    gmu AS (SELECT {key}, ys, n,
                   {R("list_reduce(ys, (x, y) -> x + y) / n")} AS mu
            FROM gpk),
    gc0 AS (SELECT {key}, ys, n, mu,
                   {R("list_reduce(list_transform(ys, x -> "
                      "(x - mu) * (x - mu)), (x, y) -> x + y) / n")} AS c0
            FROM gmu),
    gsb AS (SELECT {key}, ys, n, mu, c0,
                   list_transform(generate_series(1, CAST(n AS BIGINT)),
                                  t -> {prefix_abs}) AS sabs
            FROM gc0),
    gbt AS (SELECT {key}, ys, n, mu, c0,
                   list_max(sabs) AS best,
                   list_position(sabs, list_max(sabs)) AS bt
            FROM gsb),
    gst AS (SELECT {key}, ys, n, bt,
                   CASE WHEN {R("sqrt(c0)")} > 0
                        THEN {R(f"best / ({_oracle_r6('sqrt(c0)')}"
                                f" * sqrt(CAST(n AS DOUBLE)))")}
                        ELSE 0.0 END AS stat,
                   {R("list_reduce(ys[1:CAST(bt AS BIGINT)], "
                      "(x, y) -> x + y) / bt")} AS mean_before,
                   CASE WHEN bt < n THEN
                     {R("list_reduce(ys[CAST(bt + 1 AS BIGINT):"
                        "CAST(n AS BIGINT)], (x, y) -> x + y) / (n - bt)")}
                   ELSE NULL END AS mean_after
            FROM gbt)
    SELECT {key}, CAST(n AS BIGINT) AS n, CAST(bt AS BIGINT) AS t_star,
           stat, mean_before, mean_after,
           CASE WHEN mean_after IS NOT NULL
                THEN {R("mean_after - mean_before")} END AS delta,
           stat > CAST({_CUSUM_CRIT_95!r} AS DOUBLE) AS significant
    FROM gst"""


def seasonal_decompose(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    period: int = 24,
) -> DataFrame:
    """Classic additive seasonal decomposition per key (the moving-
    average method STL generalizes; Kendall & Stuart's "ratio to
    moving average" in additive form): trend = centered moving average
    of width ``period`` (the 2×m weighted form when m is even, so the
    window stays symmetric), seasonal = per-phase mean of the
    detrended values re-centered to sum ≈ 0, remainder = y − trend −
    seasonal. THE decomposition a capacity planner reads before
    trusting any forecast: how much of the series is structure vs
    noise. Returns (keys..., t, phase, y, trend, seasonal, remainder)
    for every bucket; trend/remainder are NULL in the half-window
    edges where the centered MA is undefined. Keys with fewer than
    2·``period`` buckets drop (so every phase has ≥1 detrended
    observation).

    Scale shape: ONE hash agg upstream builds the series; here a
    single groupBy collects each key's horizon-bounded array and
    everything — the n moving-average windows (O(n·m) scalar adds),
    the m phase means, the re-centering — is Catalyst ``aggregate`` /
    ``transform`` folds, JVM-side, sequential (bit-identical to the
    oracle's left-to-right list folds), 6-dp-rounded via ``_r6`` at
    every emitted scalar. No UDF, no window, no driver state. Cite:
    reference has no time-series tier; extends SURVEY §2.11 beside
    holt_winters_forecast (whose seasonal state this decomposition
    lets a user sanity-check)."""
    if period < 2:
        raise ValueError("period must be >= 2")
    m = period
    h = m // 2
    even = m % 2 == 0
    arr = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(t_col).alias("t"),
                                    F.col(value_col).alias("y")))
        ),
        lambda s: s["y"].cast("double"),
    )
    per_key = (
        series.groupBy(*key_cols)
        .agg(arr.alias("__ys"))
        .filter(F.size("__ys") >= 2 * m)
    )

    def lsum(xs: Column) -> Column:
        return F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x)

    n = F.size("__ys")
    staged = per_key.select(*key_cols, "__ys", n.alias("__n"))

    def trend_at(t: Column) -> Column:
        ys = F.col("__ys")
        if even:
            core = lsum(F.slice(ys, t - h + 1, F.lit(m - 1)))
            return _r6(
                (F.element_at(ys, t - h) * F.lit(0.5)
                 + core
                 + F.element_at(ys, t + h) * F.lit(0.5))
                / F.lit(float(m))
            )
        return _r6(lsum(F.slice(ys, t - h, F.lit(m))) / F.lit(float(m)))

    tr = F.transform(
        F.sequence(F.lit(1), F.col("__n")),
        lambda t: F.when(
            (t >= h + 1) & (t <= F.col("__n") - h), trend_at(t)
        ).otherwise(F.lit(None).cast("double")),
    )
    with_tr = staged.select(*key_cols, "__ys", "__n", tr.alias("__tr"))

    def phase_of(t: Column) -> Column:
        return (t - 1) % m + 1

    def phase_ts(p: Column) -> Column:
        return F.filter(
            F.sequence(F.lit(h + 1), F.col("__n") - h),
            lambda t: phase_of(t) == p,
        )

    sr = F.transform(
        F.sequence(F.lit(1), F.lit(m)),
        lambda p: _r6(
            F.aggregate(
                phase_ts(p),
                F.lit(0.0),
                lambda acc, t: acc
                + F.element_at(F.col("__ys"), t)
                - F.element_at(F.col("__tr"), t),
            )
            / F.size(phase_ts(p)).cast("double")
        ),
    )
    with_sr = with_tr.select(*key_cols, "__ys", "__n", "__tr",
                             sr.alias("__sr"))
    sm = _r6(lsum(F.col("__sr")) / F.lit(float(m)))
    se = F.transform(F.col("__sr"), lambda s: _r6(s - sm))
    with_se = with_sr.select(*key_cols, "__ys", "__n", "__tr",
                             se.alias("__se"))
    exploded = with_se.select(
        *key_cols, "__ys", "__tr", "__se",
        F.posexplode(F.sequence(F.lit(1), F.col("__n")))
        .alias("__i", "__t"),
    )
    t = F.col("__t")
    y = F.element_at("__ys", t)
    trend = F.element_at("__tr", t)
    seasonal = F.element_at("__se", phase_of(t))
    return exploded.select(
        *key_cols,
        t.cast("long").alias("t"),
        phase_of(t).cast("long").alias("phase"),
        y.alias("y"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.when(trend.isNotNull(), _r6(y - trend - seasonal))
        .alias("remainder"),
    )


def seasonal_decompose_oracle_sql(
    series_cte: str,
    key: str = "event_type",
    period: int = 24,
) -> str:
    """DuckDB replica of ``seasonal_decompose``: the same grouped series
    list, centered-MA list folds (2×m weighted form for even m),
    per-phase detrended means, re-centering, and remainder — every
    scalar ``_r6``-rounded at the identical points."""
    R = _oracle_r6
    m = period
    h = m // 2
    even = m % 2 == 0
    if even:
        trend_expr = R(
            f"(ys[CAST(t - {h} AS BIGINT)] * 0.5 + "
            f"list_reduce(ys[CAST(t - {h} + 1 AS BIGINT):"
            f"CAST(t + {h} - 1 AS BIGINT)], (x, y) -> x + y) + "
            f"ys[CAST(t + {h} AS BIGINT)] * 0.5) / {float(m)!r}"
        )
    else:
        trend_expr = R(
            f"list_reduce(ys[CAST(t - {h} AS BIGINT):"
            f"CAST(t + {h} AS BIGINT)], (x, y) -> x + y) / {float(m)!r}"
        )
    return f"""WITH {series_cte},
    hpk AS (SELECT {key}, list(y ORDER BY t) AS ys, count(*) AS n
            FROM series GROUP BY {key}
            HAVING count(*) >= {2 * m}),
    htr AS (SELECT {key}, ys, n,
                   list_transform(generate_series(1, CAST(n AS BIGINT)),
                     t -> CASE WHEN t >= {h + 1} AND t <= n - {h}
                               THEN {trend_expr} ELSE NULL END) AS tr
            FROM hpk),
    hsr AS (SELECT {key}, ys, n, tr,
                   list_transform(generate_series(1, {m}), p ->
                     {R(f"list_reduce(list_transform("
                        f"list_filter(generate_series({h + 1}, "
                        f"CAST(n - {h} AS BIGINT)), "
                        f"t -> (t - 1) % {m} + 1 = p), "
                        f"t -> ys[CAST(t AS BIGINT)] - "
                        f"tr[CAST(t AS BIGINT)]), (x, y) -> x + y) / "
                        f"len(list_filter(generate_series({h + 1}, "
                        f"CAST(n - {h} AS BIGINT)), "
                        f"t -> (t - 1) % {m} + 1 = p))")}) AS sr
            FROM htr),
    hse AS (SELECT {key}, ys, n, tr,
                   list_transform(sr, s ->
                     {R(R("list_reduce(sr, (x, y) -> x + y) / "
                          + repr(float(m))) + " * (-1.0) + s")}) AS se
            FROM hsr),
    hxp AS (SELECT {key}, ys, tr, se,
                   unnest(generate_series(1, CAST(n AS BIGINT))) AS t
            FROM hse)
    SELECT {key}, CAST(t AS BIGINT) AS t,
           CAST((t - 1) % {m} + 1 AS BIGINT) AS phase,
           ys[CAST(t AS BIGINT)] AS y,
           tr[CAST(t AS BIGINT)] AS trend,
           se[CAST((t - 1) % {m} + 1 AS BIGINT)] AS seasonal,
           CASE WHEN tr[CAST(t AS BIGINT)] IS NOT NULL THEN
             {R("ys[CAST(t AS BIGINT)] - tr[CAST(t AS BIGINT)] - "
                f"se[CAST((t - 1) % {m} + 1 AS BIGINT)]")}
           END AS remainder
    FROM hxp"""


def cross_correlation(
    series_a: DataFrame,
    series_b: DataFrame,
    t_col: str,
    y_col: str,
    max_lag: int = 6,
) -> DataFrame:
    """Sample cross-correlation function between two bucketed series
    sharing one time axis — the LEAD/LAG diagnostic the ACF can't
    answer: does series A at hour t predict series B at hour t+ℓ?
    For every lag ℓ ∈ [−max_lag, +max_lag], ``ccf`` is the Pearson
    correlation of the MATCHED pairs (a_t, b_{t+ℓ}) (the overlap
    convention: means/variances recomputed per lag over the n−|ℓ|
    aligned buckets — exactly what a regression on the shifted series
    would see; the alternative fixed-global-moment estimator is
    documented and NOT used). ``best`` flags the lag(s) with the
    largest |ccf| among defined lags.

    Returns (lag, n, ccf, best) — one row per lag, 6-dp rounded; ccf
    NULL when a lag has < 2 matched pairs or a constant side.

    Scale shape: both inputs are horizon-bounded bucketed frames (the
    module contract above); the lag frame (2·max_lag+1 rows) is
    broadcast, the shifted equi-join and per-lag co-moment agg touch
    |series|·(2K+1) bounded rows. Cite: reference has no forecast
    tier; extends SURVEY §2.11 beside acf/holt_winters."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    spark = series_a.sparkSession
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = series_a.select(
        F.col(t_col).cast("long").alias("__t"),
        F.col(y_col).cast("double").alias("__ya"),
    ).na.drop()
    b = series_b.select(
        F.col(t_col).cast("long").alias("__t"),
        F.col(y_col).cast("double").alias("__yb"),
    ).na.drop()
    shifted = (
        a.crossJoin(F.broadcast(lags))
        .select("lag", (F.col("__t") + F.col("lag")).alias("__tb"),
                "__ya")
        .join(b, F.col("__tb") == b["__t"])
    )
    mom = shifted.groupBy("lag").agg(
        F.count("*").cast("double").alias("__n"),
        F.sum("__ya").alias("__sa"),
        F.sum(F.col("__ya") * F.col("__ya")).alias("__qa"),
        F.sum("__yb").alias("__sb"),
        F.sum(F.col("__yb") * F.col("__yb")).alias("__qb"),
        F.sum(F.col("__ya") * F.col("__yb")).alias("__sab"),
    )
    n = F.col("__n")
    cov = n * F.col("__sab") - F.col("__sa") * F.col("__sb")
    va = n * F.col("__qa") - F.col("__sa") * F.col("__sa")
    vb = n * F.col("__qb") - F.col("__sb") * F.col("__sb")
    ok = (n >= 2) & (va > 0) & (vb > 0)
    scored = lags.join(mom, "lag", "left").select(
        "lag",
        F.coalesce(n, F.lit(0.0)).cast("long").alias("n"),
        F.when(ok, F.round(cov / F.sqrt(va * vb), 6))
        .otherwise(F.lit(None).cast("double")).alias("ccf"),
    )
    peak = scored.agg(F.max(F.abs(F.col("ccf"))).alias("__peak"))
    return (
        scored.crossJoin(F.broadcast(peak))
        .select(
            "lag", "n", "ccf",
            F.when(
                F.col("ccf").isNotNull(),
                F.abs(F.col("ccf")) == F.col("__peak"),
            ).otherwise(F.lit(None).cast("boolean")).alias("best"),
        )
    )


def cross_correlation_oracle_sql(
    series_ctes: str,
    series_a: str,
    series_b: str,
    t_sql: str,
    y_sql: str,
    max_lag: int = 6,
) -> str:
    """DuckDB replica of ``cross_correlation`` over two prepared series
    CTEs — identical matched-pair overlap, per-lag co-moments, and
    peak flag."""
    return f"""WITH {series_ctes},
    cca AS (SELECT CAST({t_sql} AS BIGINT) AS t,
                   CAST({y_sql} AS DOUBLE) AS ya FROM {series_a}),
    ccb AS (SELECT CAST({t_sql} AS BIGINT) AS t,
                   CAST({y_sql} AS DOUBLE) AS yb FROM {series_b}),
    lags AS (SELECT CAST(unnest(range(-{max_lag}, {max_lag} + 1))
                        AS INTEGER) AS lag),
    mom AS (
      SELECT l.lag, CAST(count(*) AS DOUBLE) AS n,
             sum(a.ya) AS sa, sum(a.ya * a.ya) AS qa,
             sum(b.yb) AS sb, sum(b.yb * b.yb) AS qb,
             sum(a.ya * b.yb) AS sab
      FROM cca a CROSS JOIN lags l
      JOIN ccb b ON b.t = a.t + l.lag
      GROUP BY l.lag),
    scored AS (
      SELECT lags.lag,
             CAST(coalesce(mom.n, 0.0) AS BIGINT) AS n,
             CASE WHEN mom.n >= 2
                       AND (mom.n * mom.qa - mom.sa * mom.sa) > 0
                       AND (mom.n * mom.qb - mom.sb * mom.sb) > 0
                  THEN round((mom.n * mom.sab - mom.sa * mom.sb)
                             / sqrt((mom.n * mom.qa - mom.sa * mom.sa)
                                    * (mom.n * mom.qb - mom.sb * mom.sb)),
                             6) + 0 END AS ccf
      FROM lags LEFT JOIN mom ON mom.lag = lags.lag),
    peak AS (SELECT max(abs(ccf)) AS p FROM scored)
    SELECT lag, n, ccf,
           CASE WHEN ccf IS NOT NULL THEN abs(ccf) = peak.p END AS best
    FROM scored CROSS JOIN peak"""

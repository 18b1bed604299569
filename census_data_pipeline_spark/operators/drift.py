"""Distribution-drift detection between two samples of a numeric
column — the monitoring layer that decides whether yesterday's data
still looks like today's (feature drift before a model retrain,
snapshot drift before a promotion; composes with the DQ verdicts in
operators/quality.py):

- **KS statistic** (Kolmogorov–Smirnov): max |F_a(x) − F_b(x)| over
  the pooled empirical CDFs — distribution-free, sensitive anywhere.
- **PSI** (population stability index): Σ (p_i − q_i)·ln(p_i/q_i)
  over quantile bins of the REFERENCE sample — the
  industry-standard scorecard-monitoring metric (rule of thumb:
  <0.1 stable, 0.1–0.25 drifting, >0.25 shifted).

Scale shapes: the KS CDFs are running sums over the DISTINCT pooled
values — computed with the two-phase bucketed prefix sum
(operators/prefixsum.running_sum_scalable), so no unpartitioned
window even when the value space is large; everything else is
grouped counts. PSI is a broadcast of <=n_bins rounded bin edges +
one conditional-count aggregation per side — map-only over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_data_pipeline_spark.operators.prefixsum import running_sum_scalable


def ks_statistic(
    df_a: DataFrame, df_b: DataFrame, value_col: str
) -> DataFrame:
    """One row (ks_stat, n_a, n_b): the exact two-sample KS statistic
    (supremum of |F_a − F_b| over the pooled distinct values, CDFs
    right-continuous — ties across samples handled exactly). NULLs are
    excluded (not comparable on the value axis)."""
    a = df_a.select(F.col(value_col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    b = df_b.select(F.col(value_col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    counts = (
        a.groupBy("__v").agg(F.count("*").alias("__ca"))
        .join(
            b.groupBy("__v").agg(F.count("*").alias("__cb")),
            "__v", "full_outer",
        )
        .select(
            "__v",
            F.coalesce("__ca", F.lit(0)).alias("__ca"),
            F.coalesce("__cb", F.lit(0)).alias("__cb"),
        )
    )
    cum = running_sum_scalable(
        running_sum_scalable(counts, "__v", "__ca", output_col="__cuma"),
        "__v", "__cb", output_col="__cumb",
    )
    na = a.count()
    nb = b.count()
    return cum.agg(
        F.round(
            F.max(F.abs(F.col("__cuma") / F.lit(float(na))
                        - F.col("__cumb") / F.lit(float(nb)))), 6
        ).alias("ks_stat"),
        F.lit(na).alias("n_a"),
        F.lit(nb).alias("n_b"),
    )


def psi(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
    epsilon: float = 1e-4,
) -> DataFrame:
    """Population stability index over ``n_bins`` quantile bins of the
    REFERENCE sample: per-bin rows (bin, p_ref, p_cur, contribution)
    plus the bin edges implicitly via ordering; sum `contribution` for
    the headline PSI. Bin edges are the reference's interior quantiles
    rounded to 6 (cross-engine-stable boundaries); each side's
    proportions are clamped by ``epsilon`` so empty bins contribute a
    finite penalty (the standard continuity correction).

    Bin i (1-based) = 1 + number of edges strictly below the value, so
    values equal to an edge fall in the LOWER bin — deterministic."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    qs = [i / n_bins for i in range(1, n_bins)]
    # ONE percentile buffer for all edges (r14 — see
    # equidepth_histogram): identical doubles, n_bins−1× less
    # aggregation-buffer funneling
    edges_row = reference.agg(
        F.percentile(
            F.col(value_col).cast("double"),
            F.array(*[F.lit(q) for q in qs]),
        ).alias("__qs")
    ).select(
        *[
            F.round(F.col("__qs")[i], 6).alias(f"__e{i}")
            for i in range(len(qs))
        ]
    )

    def bin_col(edges):
        v = F.col(value_col).cast("double")
        b = F.lit(1)
        for i in range(len(qs)):
            b = b + F.when(v > edges[i], 1).otherwise(0)
        return b

    def proportions(df, name):
        edges = [F.col(f"__e{i}") for i in range(len(qs))]
        binned = df.crossJoin(F.broadcast(edges_row)).select(
            bin_col(edges).alias("bin")
        )
        n = df.count()
        return (
            binned.groupBy("bin").agg(
                (F.count("*") / F.lit(float(n))).alias(name)
            )
        )

    bins = (
        proportions(reference, "p_ref")
        .join(proportions(current, "p_cur"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("p_ref", F.lit(0.0)).alias("p_ref"),
            F.coalesce("p_cur", F.lit(0.0)).alias("p_cur"),
        )
    )
    pr = F.greatest(F.col("p_ref"), F.lit(epsilon))
    pc = F.greatest(F.col("p_cur"), F.lit(epsilon))
    return bins.select(
        "bin",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round((pr - pc) * F.log(pr / pc), 6).alias("contribution"),
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram — the distribution
    summary optimizers and dashboards both want: ``n_bins`` buckets
    holding ~equal row counts, each reporting its observed [lo, hi],
    row count and mean. Shares PSI's binning discipline (interior
    quantile edges rounded to 6 so any engine draws identical
    boundaries; values equal to an edge fall in the LOWER bin) but
    reports the buckets themselves instead of comparing two samples.

    One percentile aggregation (a 1-row broadcast edges frame) + one
    map-side bin assignment + one grouped agg — the corpus never
    shuffles except for the final ≤``n_bins``-row aggregate. NULLs are
    excluded (no bucket holds them).

    ``approx`` is the 100 TB lever (VERDICT r4 #3, same discipline as
    ``normalize`` / ``robust_outliers`` / ``profile_columns``): exact
    ``F.percentile`` funnels EVERY value into one final aggregation
    buffer — the ``n_bins`` edges are exact, correct for oracle parity
    at test SF, but the single-buffer sort is an OOM at 100×. With
    ``approx=True`` the edges come from ``percentile_approx`` (KLL-style
    mergeable sketch, bounded memory ∝ ``accuracy``, rank error
    ≤ 1/accuracy) — buckets are then (1−ε)-balanced rather than exact,
    which is what a statistics collector wants at scale. Bin counts /
    lo / hi / mean remain EXACT for whichever edges were drawn; only
    edge placement is approximate (SCALING.md "Exact percentiles")."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    from census_data_pipeline_spark.sources.catalog import (
        ensure_parallelism,
    )

    qs = [i / n_bins for i in range(1, n_bins)]
    # parallelize the partials (r14): a single-file scan arrives as one
    # partition, serializing the percentile partial aggregation; the
    # exact percentile is order-independent, so the repartition cannot
    # move an edge
    base = ensure_parallelism(df.filter(F.col(value_col).isNotNull())).select(
        F.col(value_col).cast("double").alias("__v")
    )
    if approx:
        pct = base.agg(
            F.percentile_approx(
                "__v", F.array(*[F.lit(q) for q in qs]), F.lit(accuracy)
            ).alias("__qs")
        )
        edges_row = pct.select(
            *[
                F.round(F.col("__qs")[i], 6).alias(f"__e{i}")
                for i in range(len(qs))
            ]
        )
    else:
        # ONE percentile buffer (r14): the scalar-per-edge form kept
        # n_bins−1 independent Percentile aggregation buffers, each
        # funneling EVERY value; the array form computes all edges
        # from one buffer (identical doubles — same sorted-counts
        # evaluation per percentage). Probed 3.5 → 1.4 s with the
        # parallelized partials below.
        pct = base.agg(
            F.percentile(
                "__v", F.array(*[F.lit(q) for q in qs])
            ).alias("__qs")
        )
        edges_row = pct.select(
            *[
                F.round(F.col("__qs")[i], 6).alias(f"__e{i}")
                for i in range(len(qs))
            ]
        )
    b = F.lit(1)
    for i in range(len(qs)):
        b = b + F.when(F.col("__v") > F.col(f"__e{i}"), 1).otherwise(0)
    return (
        base.crossJoin(F.broadcast(edges_row))
        .select(b.alias("bin"), "__v")
        .groupBy("bin")
        .agg(
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
            F.count("*").alias("n"),
            F.round(F.avg("__v"), 6).alias("mean"),
        )
    )


def chi2_drift(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
) -> DataFrame:
    """Two-sample chi-square homogeneity test for CATEGORICAL drift —
    completing the drift trio (KS: continuous; PSI: binned numeric;
    chi²: categories). For each category c of the 2×C contingency
    table, contribution = Σ_side (observed − expected)²/expected with
    expected = row_total·col_total/N; Σ contributions ~ χ²(C−1) under
    no-drift. Output per category: (category, n_ref, n_cur,
    contribution); categories absent from one side contribute with
    observed = 0 (never silently dropped — that is where drift lives).

    One conditional aggregate over the flag-tagged union (map-side
    combine, category-keyed shuffle) + a 1-row totals broadcast — no
    data-scale window, same shape as PSI. All terms are exact-integer-
    derived doubles rounded to 6, so any engine reproduces them."""
    tagged = ref.select(F.col(cat_col).alias("cat"),
                        F.lit(1).alias("__is_ref")).unionAll(
        cur.select(F.col(cat_col).alias("cat"), F.lit(0).alias("__is_ref"))
    )
    counts = tagged.groupBy("cat").agg(
        F.sum("__is_ref").cast("long").alias("n_ref"),
        F.sum(F.lit(1) - F.col("__is_ref")).cast("long").alias("n_cur"),
    )
    totals = counts.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    n = F.col("__tr") + F.col("__tc")
    col_total = F.col("n_ref") + F.col("n_cur")
    e_ref = F.col("__tr") * col_total / n
    e_cur = F.col("__tc") * col_total / n
    contribution = (
        F.pow(F.col("n_ref") - e_ref, 2) / e_ref
        + F.pow(F.col("n_cur") - e_cur, 2) / e_cur
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        F.col("cat").alias(cat_col),
        "n_ref", "n_cur",
        F.round(contribution, 6).alias("contribution"),
    )


def wasserstein_1(
    df_a: DataFrame, df_b: DataFrame, value_col: str
) -> DataFrame:
    """One row (w1_distance, n_a, n_b): the exact two-sample
    1-Wasserstein (earth-mover) distance ∫|F_a − F_b| dx — the
    MAGNITUDE companion to ``ks_statistic`` (KS answers "did the
    distribution move?", W1 answers "by how much, in the value's own
    units"; a tiny-but-everywhere shift and a one-bucket spike can
    share a KS yet differ 100× in W1). Closed form over the pooled
    distinct values: Σ_i |F_a(x_i) − F_b(x_i)|·(x_{i+1} − x_i).
    NULLs are excluded; an empty side yields NULL distance; identical
    point masses yield exactly 0.0.

    Scale shape: the same pooled distinct-value frame as
    ``ks_statistic`` with both CDFs and a rank computed in ONE
    two-phase bucketed prefix-sum pass
    (operators/prefixsum.running_sums_scalable — no unpartitioned
    window, and the bucketing machinery is paid once, not three
    times), then one rank→rank+1 equi-join to pair each distinct
    value with its successor (the gap Δx), one multiply, one global
    sum. Cite: reference has no drift tier; extends SURVEY
    §2.11 beside ks_statistic/psi."""
    a = df_a.select(F.col(value_col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    b = df_b.select(F.col(value_col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    na, nb = a.count(), b.count()
    if na == 0 or nb == 0:
        return a.sparkSession.range(1).select(
            F.lit(None).cast("double").alias("w1_distance"),
            F.lit(na).cast("long").alias("n_a"),
            F.lit(nb).cast("long").alias("n_b"),
        )
    counts = (
        a.groupBy("__v").agg(F.count("*").alias("__ca"))
        .join(
            b.groupBy("__v").agg(F.count("*").alias("__cb")),
            "__v", "full_outer",
        )
        .select(
            "__v",
            F.coalesce("__ca", F.lit(0)).alias("__ca"),
            F.coalesce("__cb", F.lit(0)).alias("__cb"),
            F.lit(1).alias("__one"),
        )
    )
    from census_data_pipeline_spark.operators.prefixsum import (
        running_sums_scalable,
    )

    cum = running_sums_scalable(
        counts, "__v", ["__ca", "__cb", "__one"],
        ["__cuma", "__cumb", "__rk"],
    )
    nxt = cum.select(
        (F.col("__rk") - 1).alias("__rk"), F.col("__v").alias("__vn")
    )
    seg = cum.join(nxt, "__rk").select(
        (
            F.abs(
                F.col("__cuma") / F.lit(float(na))
                - F.col("__cumb") / F.lit(float(nb))
            )
            * (F.col("__vn") - F.col("__v"))
        ).alias("__w")
    )
    return seg.agg(
        F.coalesce(F.round(F.sum("__w"), 6), F.lit(0.0))
        .alias("w1_distance"),
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
    )

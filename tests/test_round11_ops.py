"""Round-11 regression tests: the four ADVICE r10 hardening fixes
(sentinel-collision guard in Markov attribution, bootstrap empty-arm
row preservation, markov_stationary NULL hygiene, SQ8 mse precision).
New r11 operators get their own sections below as they land.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from census_data_pipeline_spark.operators.attribution import (
    markov_attribution_oracle_sql,
    markov_removal_attribution,
)
from census_data_pipeline_spark.operators.rollup import (
    bootstrap_mean_diff,
    bootstrap_mean_diff_oracle_sql,
    markov_stationary,
    markov_stationary_oracle_sql,
)


def _string_parity(spark_df, con, oracle_sql):
    srows = sorted(
        tuple(str(v) for v in r) for r in spark_df.collect()
    )
    orows = sorted(
        tuple(str(v) for v in r)
        for r in con.execute(oracle_sql).fetchall()
    )
    assert srows == orows, f"\nspark  {srows}\noracle {orows}"


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


# --- sentinel-collision guard (ADVICE r10 #1) -------------------------------


def test_markov_removal_sentinel_type_names(spark):
    """Event types literally named 'null', 'conv', and 'start' must
    behave as ordinary channels, not merge with the synthetic
    source/absorbing states: with identical symmetric journeys
    ('null' -> purchase, 'start' -> purchase, 'conv' -> no purchase
    twice over) the two converting channels split credit evenly."""
    rows = []
    uid = 0
    for ch, converts in [("null", True), ("start", True),
                         ("conv", False), ("conv", False)]:
        rows.append((uid, _ts(0), 2 * uid, ch))
        if converts:
            rows.append((uid, _ts(1), 2 * uid + 1, "purchase"))
        uid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string"
    )
    out = markov_removal_attribution(
        df, "ts", "user_id", "event_type", "event_id", "purchase"
    )
    got = {r.channel: r for r in out.collect()}
    assert set(got) == {"null", "start", "conv"}
    assert got["null"].attribution_share == pytest.approx(0.5, abs=1e-6)
    assert got["start"].attribution_share == pytest.approx(0.5, abs=1e-6)
    assert got["conv"].removal_effect == pytest.approx(0.0, abs=1e-6)

    con = duckdb.connect()
    con.register("mrs_ev", pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type"]
    ))
    _string_parity(out, con, markov_attribution_oracle_sql(
        "mrs_ev", "ts", "user_id", "event_type", "event_id", "purchase"
    ))
    con.close()


# --- bootstrap empty-arm row preservation (ADVICE r10 #2) -------------------


def test_bootstrap_empty_arm_keeps_diagnostics_row(spark):
    """One cohort arm empty -> n_boot_effective = 0 must still emit
    ONE row carrying n_a/n_b with NULL CI, not collapse to zero rows."""
    rows = [(f"a{i}", True, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "id string, c boolean, v double")
    out = bootstrap_mean_diff(df, "id", F.col("c"), "v", n_boot=20)
    got = out.collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_a == 5 and r.n_b == 0
    assert r.ci_lo is None and r.ci_hi is None
    assert r.n_boot_effective == 0

    con = duckdb.connect()
    con.register("bse_t", pd.DataFrame(rows, columns=["id", "c", "v"]))
    _string_parity(out, con, bootstrap_mean_diff_oracle_sql(
        "bse_t", "id", "c", "v", n_boot=20
    ))
    con.close()


# --- markov_stationary NULL hygiene (ADVICE r10 #3) -------------------------


def test_markov_stationary_null_types_dropped(spark):
    """NULL event types must not splinter bigrams, seed a phantom
    NULL state, or leak initial mass: stationary_prob still sums to 1
    and parity with the (same-filtered) oracle holds."""
    rows = [
        (1, _ts(0), 0, "a"), (1, _ts(1), 1, None),
        (1, _ts(2), 2, "b"), (1, _ts(3), 3, "a"),
        (2, _ts(0), 4, "b"), (2, _ts(1), 5, "a"),
        (2, _ts(2), 6, "b"), (2, _ts(3), 7, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string"
    )
    out = markov_stationary(df, "ts", "user_id", "event_type",
                            "event_id")
    got = out.collect()
    assert {r.event_type for r in got} == {"a", "b"}
    assert sum(r.stationary_prob for r in got) == pytest.approx(
        1.0, abs=1e-5
    )

    con = duckdb.connect()
    con.register("mkn_ev", pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type"]
    ))
    _string_parity(out, con, markov_stationary_oracle_sql(
        "mkn_ev", "ts", "user_id", "event_type", "event_id"
    ))
    con.close()


# --- SQ8 mse precision (ADVICE r10 #4) --------------------------------------


def test_sq8_mse_retains_signal_at_12dp(spark):
    """A unit-range uniform grid's mse ≈ step²/12 ≈ 1.28e-6 must come
    back with real significant digits, not round to 1e-6 or 0."""
    import math

    from census_data_pipeline_spark.functions.similarity import (
        quantize_sq8,
    )

    rows = [(i, [i / 999.0]) for i in range(1000)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    r = quantize_sq8(df, "embedding").collect()[0]
    expected = (1.0 / 255.0) ** 2 / 12.0
    assert r.mse == pytest.approx(expected, rel=0.2)
    # 6-dp rounding would have produced exactly 1e-6 or 0.0
    assert r.mse not in (0.0, 1e-6)

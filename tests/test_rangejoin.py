"""Interval join semantics (operators/rangejoin.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from census_data_pipeline_spark.operators.rangejoin import interval_join


def _ts(s: int):
    return datetime(2024, 1, 1) + timedelta(seconds=s)


def test_interval_join_matches_naive_filter(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(40), "b"), (2, _ts(10), "c")],
        "k long, ts timestamp, lpay string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "r5"), (1, _ts(15), "r15"), (1, _ts(30), "r30"),
         (2, _ts(100), "r100")],
        "k long, ts timestamp, v string",
    )
    out = interval_join(
        left, right, on=["k"], lower_us=-5_000_000, upper_us=5_000_000
    )
    got = {(r.k, r.ts, r.r_v) for r in out.collect()}
    # window is [ts-5s, ts+5s] inclusive; (2, ts10) has no right row nearby
    assert got == {(1, _ts(10), "r5"), (1, _ts(10), "r15")}


def test_interval_join_asymmetric_bounds_and_edges(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), "same"), (1, _ts(13), "in"), (1, _ts(14), "out"),
         (1, _ts(9), "before")],
        "k long, ts timestamp, v string",
    )
    # forward-only window (ts, ts+3]... bounds are inclusive on both ends
    out = interval_join(left, right, on=["k"], lower_us=0, upper_us=3_000_000)
    assert {r.r_v for r in out.collect()} == {"same", "in"}


def test_interval_join_rejects_inverted_bounds(spark):
    df = spark.createDataFrame([(1, _ts(0))], "k long, ts timestamp")
    with pytest.raises(ValueError):
        interval_join(df, df, on=["k"], lower_us=5, upper_us=1)


def test_interval_join_equals_naive_property(spark):
    """Banded rewrite == naive cross-filter for arbitrary timestamps and
    bounds (hypothesis sweeps band-boundary alignments example tests miss)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 3600)),
                 min_size=1, max_size=15),
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 3600)),
                 min_size=1, max_size=15),
        st.integers(-600, 600),
        st.integers(0, 900),
    )
    def run(lrows, rrows, lo_s, width_s):
        lo_us, hi_us = lo_s * 1_000_000, (lo_s + width_s) * 1_000_000
        left = spark.createDataFrame(
            [(k, _ts(s)) for k, s in lrows], "k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(k, _ts(s), f"p{i}") for i, (k, s) in enumerate(rrows)],
            "k long, ts timestamp, v string",
        )
        got = {
            (r.k, r.ts, r.r_v)
            for r in interval_join(
                left, right, on=["k"], lower_us=lo_us, upper_us=hi_us
            ).collect()
        }
        want = {
            (k, _ts(ls), f"p{i}")
            for k, ls in lrows
            for i, (rk, rs) in enumerate(rrows)
            if rk == k and lo_s <= rs - ls <= lo_s + width_s
        }
        assert got == want

    run()


def test_interval_join_is_hash_equi_join(spark):
    """The banded rewrite must plan as a hash equi-join on (keys, bucket) —
    not a nested-loop over the range predicate."""
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(11), 1.0)], "k long, ts timestamp, v double")
    out = interval_join(left, right, on=["k"], lower_us=-60_000_000, upper_us=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

"""As-of join semantics (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

from census_data_pipeline_spark.operators.asof import asof_join


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_with_ties_and_misses(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "l1"), (1, _ts(4), "l0"), (2, _ts(5), "l2")],
        "k long, ts timestamp, lpay string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "r5"), (1, _ts(10), "r10"), (2, _ts(6), "r6")],
        "k long, ts timestamp, v string",
    )
    out = {(r.k, r.ts): r for r in asof_join(left, right, on=["k"]).collect()}
    assert len(out) == 3  # every left row kept
    assert out[(1, _ts(4))].asof_v is None  # no earlier right row
    assert out[(1, _ts(10))].asof_v == "r10"  # tie at equal ts included
    assert out[(2, _ts(5))].asof_v is None  # right row is later -> miss
    assert out[(1, _ts(10))].asof_ts == _ts(10)
    assert out[(1, _ts(10))].lpay == "l1"  # left payload preserved


def test_asof_multiple_matches_takes_latest(spark):
    left = spark.createDataFrame([(1, _ts(30))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(s), float(s)) for s in (5, 15, 25)], "k long, ts timestamp, v double"
    )
    row = asof_join(left, right, on=["k"]).collect()[0]
    assert row.asof_v == 25.0 and row.asof_ts == _ts(25)

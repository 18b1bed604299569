"""Deterministic hash sampling (functions/sampling.py)."""

from __future__ import annotations

import pytest

from census_data_pipeline_spark.functions import sampling


@pytest.fixture()
def keyed(spark):
    return spark.createDataFrame(
        [(i, "hot" if i % 3 else "rare") for i in range(400)], "k long, s string"
    )


def test_hash_sample_deterministic_and_monotone(keyed):
    small = {r.k for r in sampling.hash_sample(keyed, "k", 13).collect()}
    again = {r.k for r in sampling.hash_sample(keyed, "k", 13).collect()}
    big = {r.k for r in sampling.hash_sample(keyed, "k", 64).collect()}
    assert small == again  # deterministic
    assert small <= big  # monotone: 5% sample nests inside 25% sample
    assert 0 < len(small) < len(big) < 400


def test_hash_sample_bounds(keyed):
    assert sampling.hash_sample(keyed, "k", 0).count() == 0
    assert sampling.hash_sample(keyed, "k", 256).count() == 400
    with pytest.raises(ValueError):
        sampling.hash_sample(keyed, "k", 257)
    with pytest.raises(ValueError):
        sampling.hash_sample(keyed, "k", 10, den=100)


def test_stratified_sample_rates_and_default(keyed):
    out = sampling.stratified_hash_sample(
        keyed, "k", "s", {"hot": 26}, default_num=256
    )
    rows = out.collect()
    rare = [r for r in rows if r.s == "rare"]
    hot = [r for r in rows if r.s == "hot"]
    assert len(rare) == 134  # default 256/256 keeps every rare row
    assert 0 < len(hot) < 266 * 0.3  # ~10% of the 266 hot rows
    # per-row decisions identical to the unstratified sampler
    plain_keys = {r.k for r in sampling.hash_sample(keyed, "k", 26).collect()}
    assert {r.k for r in hot} == {k for k in plain_keys if k % 3}


def test_cap_per_group_truncates_hot_groups(spark):
    from census_data_pipeline_spark.functions import sampling

    rows = [(i, "hot" if i < 90 else "rare") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.cap_per_group(df, ["source"], cap=20).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert len(by_src["hot"]) == 20      # truncated to cap
    assert len(by_src["rare"]) == 10     # passes through whole
    # deterministic: same call yields the same kept set
    again = sampling.cap_per_group(df, ["source"], cap=20).collect()
    assert sorted((r.source, r.doc_id) for r in again) == \
        sorted((r.source, r.doc_id) for r in out)

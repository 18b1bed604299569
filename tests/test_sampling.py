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


def test_temperature_sample_rebalances_sources(spark):
    rows = [(i, "hot" if i < 900 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.temperature_sample(df, "doc_id", "source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    # alpha=0.5, target N/2=500: weights q=(30, 10), S=40.
    # hot rate = 500*30/(40*900) ≈ 0.417; rare rate = 500*10/(40*100) = 1.25 -> 1
    assert len(by_src["rare"]) == 100           # rare kept whole
    assert 0.3 < len(by_src["hot"]) / 900 < 0.55  # hot ≈ 42%, hash noise
    # deterministic across invocations
    again = sampling.temperature_sample(df, "doc_id", "source").collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)


def test_epoch_shuffle_shards_matches_direct_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = sampling.epoch_shuffle_shards(df, "doc_id", seed=7, shard_size=50)
    got = {r.doc_id: (r.shuffle_pos, r.shard) for r in out.collect()}
    # direct (non-scalable) reference: one-partition row_number
    h = F.md5(F.concat_ws(":", F.lit("7"), F.col("doc_id").cast("string")))
    direct = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.substring(h, 1, 9), "doc_id"))
    )
    want = {r.doc_id: (r.rn, (r.rn - 1) // 50) for r in direct.collect()}
    assert got == want
    assert {s for _, s in got.values()} == set(range(6))  # 300/50 shards
    # a different seed is a different permutation
    other = sampling.epoch_shuffle_shards(df, "doc_id", seed=8, shard_size=50)
    assert {r.doc_id: r.shuffle_pos for r in other.collect()} != {
        k: p for k, (p, _) in got.items()
    }


def test_temperature_sample_single_stratum_hits_target(spark):
    # one source: rate = (N//2)*q/(S*p) with q=S -> N//2 / N = 1/2 exactly
    df = spark.createDataFrame([(i, "only") for i in range(1024)],
                               "doc_id long, source string")
    out = sampling.temperature_sample(df, "doc_id", "source").collect()
    # md5-threshold acceptance at floor(0.5*4096)='800' keeps ~half
    assert 0.4 < len(out) / 1024 < 0.6


def test_epoch_shuffle_is_balanced_permutation(spark):
    # positions must be exactly 1..N (bijection) and shards evenly filled
    df = spark.createDataFrame([(i,) for i in range(257)], "doc_id long")
    out = sampling.epoch_shuffle_shards(df, "doc_id", seed=3, shard_size=64).collect()
    assert sorted(r.shuffle_pos for r in out) == list(range(1, 258))
    sizes = {}
    for r in out:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
    assert sizes == {0: 64, 1: 64, 2: 64, 3: 64, 4: 1}


def test_hash_split_exhaustive_and_monotone(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = {r.doc_id: r.split for r in sampling.hash_split(
        df, "doc_id", [("train", 245), ("val", 8), ("test", 3)]).collect()}
    assert len(out) == 1000  # exhaustive: every row labeled, none duplicated
    assert set(out.values()) == {"train", "val", "test"}
    # shares roughly proportional (hash-uniform)
    n_train = sum(1 for v in out.values() if v == "train")
    assert 0.9 < n_train / (1000 * 245 / 256) < 1.1
    # monotone: growing val's share only converts train rows, never test
    wider = {r.doc_id: r.split for r in sampling.hash_split(
        df, "doc_id", [("train", 220), ("val", 33), ("test", 3)]).collect()}
    for k, v in out.items():
        if v == "val":
            assert wider[k] == "val"
        if v == "test":
            assert wider[k] == "test"
    with pytest.raises(ValueError):
        sampling.hash_split(df, "doc_id", [("a", 100), ("b", 100)])


def test_upsample_by_weight_replicates_exactly(spark):
    df = spark.createDataFrame(
        [(1, "rare"), (2, "hot"), (3, "rare")], "doc_id long, lang string"
    )
    out = sampling.upsample_by_weight(df, "lang", {"rare": 3}).collect()
    counts = {}
    for r in out:
        counts.setdefault(r.doc_id, []).append(r.copy_idx)
    assert sorted(counts[1]) == [0, 1, 2]
    assert sorted(counts[3]) == [0, 1, 2]
    assert counts[2] == [0]
    with pytest.raises(ValueError):
        sampling.upsample_by_weight(df, "lang", {"rare": 0})


def test_weighted_sample_proportional_to_weight(spark):
    """Statistical property over many disjoint seeds: an item with 9x
    the weight appears ~9x as often among winners."""
    from census_data_pipeline_spark.functions.sampling import weighted_sample

    rows = [(1, 9.0), (2, 1.0), (3, 1.0), (4, 1.0), (5, 1.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    wins = {i: 0 for i, _ in rows}
    for seed in range(120):
        (winner,) = weighted_sample(df, "id", "w", k=1, seed=seed).collect()
        wins[winner.id] += 1
    p_heavy = wins[1] / 120
    assert 0.55 < p_heavy < 0.85   # expected 9/13 ~ 0.69
    assert all(v > 0 for v in wins.values())  # everyone can win


def test_weighted_sample_deterministic_and_excludes_nonpositive(spark):
    from census_data_pipeline_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "id long, w double",
    )
    a = sorted(r.id for r in weighted_sample(df, "id", "w", 10, seed=7).collect())
    b = sorted(r.id for r in weighted_sample(df, "id", "w", 10, seed=7).collect())
    assert a == b == [1, 5]  # zero/negative/null weights never win


def test_weighted_sample_plan_is_take_ordered(spark):
    from census_data_pipeline_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame([(i, 1.0) for i in range(100)],
                               "id long, w double")
    plan = weighted_sample(df, "id", "w", 5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

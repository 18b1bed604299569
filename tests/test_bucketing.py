"""Bucketed co-located join: the shuffle must disappear
(sources/bucketing.py; SCALING.md 'storage layout' claims, made
checkable)."""

from __future__ import annotations

import pytest

from census_data_pipeline_spark.sources import bucketing


@pytest.fixture()
def facts(spark, sf_dir):
    from census_data_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return li, o


def test_bucketed_join_has_no_exchange(spark, facts):
    li, o = facts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path so the assertion targets the shuffle,
        # not a broadcast demotion
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketing.write_bucketed(li, "li_bkt", "l_orderkey", 8)
        bucketing.write_bucketed(o, "o_bkt", "o_orderkey", 8)
        a = bucketing.read_table(spark, "li_bkt")
        b = bucketing.read_table(spark, "o_bkt")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # same join on the raw (unbucketed) scans DOES shuffle — the
        # layout, not the planner, is what removed the Exchange
        raw = li.join(o, li.l_orderkey == o.o_orderkey)
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in raw_plan
        # and it still computes the right thing
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_write_bucketed_self_heals_orphaned_location(spark, facts):
    """VERDICT r5 'what's wrong': an aborted run leaves spark-warehouse/
    <table> on disk with no metastore row; mode("overwrite").saveAsTable
    then dies with LOCATION_ALREADY_EXISTS. write_bucketed must adopt or
    clear the orphan so a dirty warehouse never poisons the next run."""
    import os
    from urllib.parse import urlparse

    li, _ = facts
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(warehouse, "li_orphan_bkt")
    try:
        spark.sql("DROP TABLE IF EXISTS li_orphan_bkt")
        # simulate the aborted run: directory exists, metastore entry gone
        os.makedirs(orphan, exist_ok=True)
        with open(os.path.join(orphan, "part-stale.parquet"), "wb") as f:
            f.write(b"stale")
        bucketing.write_bucketed(li, "li_orphan_bkt", "l_orderkey", 4)
        back = bucketing.read_table(spark, "li_orphan_bkt")
        assert back.count() == li.count()
        # and a second overwrite (metastore row now present) also works
        bucketing.write_bucketed(li.limit(10), "li_orphan_bkt", "l_orderkey", 4)
        assert bucketing.read_table(spark, "li_orphan_bkt").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS li_orphan_bkt")


def _py_zorder(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_reference(spark):
    from pyspark.sql import functions as F

    rows = [(x, y) for x in (0, 1, 5, 63, 96) for y in (0, 2, 7, 63, 88)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", bucketing.zorder_value(F.col("x"), F.col("y"), bits=7).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_zorder(r.x, r.y, 7), (r.x, r.y)


def test_write_zordered_clusters_files_and_preserves_rows(spark, tmp_path):
    import itertools

    from pyspark.sql import functions as F

    rows = [(i, i * 37 % 101, i * 53 % 103) for i in range(2000)]
    df = spark.createDataFrame(rows, "rid long, x long, y long")
    out = str(tmp_path / "zsorted")
    bucketing.write_zordered(df, out, "x", "y", bits=7, n_files=8)

    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)  # lossless

    # each output file must hold a narrow, non-overlapping z-range
    per_file = (
        back.withColumn("f", F.input_file_name())
        .withColumn("z", bucketing.zorder_value(F.col("x"), F.col("y"), bits=7))
        .groupBy("f").agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    assert len(per_file) == 8
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, _) in itertools.pairwise(spans):
        assert hi1 <= lo2, "file z-ranges overlap — clustering broken"


def test_compact_files_preserves_rows_and_reduces_files(spark, tmp_path):
    from census_data_pipeline_spark.sources.bucketing import compact_files

    path = str(tmp_path / "frag")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS g")
    # fragment: 64 tiny files
    df.repartition(64).write.parquet(path)
    import glob

    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 32
    stats = compact_files(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] == before
    assert stats["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg({"id": "sum"}).first()[0] == 10_000 * 9_999 // 2


def test_compact_files_with_sort_clusters_ranges(spark, tmp_path):
    from census_data_pipeline_spark.sources.bucketing import compact_files

    path = str(tmp_path / "frag2")
    spark.range(50_000).selectExpr("id").repartition(40).write.parquet(path)
    # force >1 output file, clustered by id
    total = sum(
        __import__("os").path.getsize(f)
        for f in __import__("glob").glob(path + "/*.parquet")
    )
    stats = compact_files(spark, path, target_file_bytes=total // 3,
                          sort_col="id")
    assert stats["files_after"] >= 2
    # range clustering: per-file min/max spans must not overlap
    import glob

    spans = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        mm = spark.read.parquet(f).agg(
            {"id": "min"}
        ).first()[0], spark.read.parquet(f).agg({"id": "max"}).first()[0]
        spans.append(mm)
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # contiguous, non-overlapping ranges

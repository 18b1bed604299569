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

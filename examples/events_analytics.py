"""End-to-end product-analytics session over the events stream (the
extension tier's operational side — no reference analog): funnel →
cohort retention → first/last-touch attribution → OHLC downsampling →
time-weighted baselines → robust outlier triage → rate-anomaly flags →
distribution drift between user segments → a data-quality verdict
gate.

Every stage is an operator the driver contract verifies individually
(operators/{attribution,outliers,drift,quality}.py and the analytics
query plans); chained here they form the daily ops-dashboard job — a
handful of grouped aggregations and user-keyed joins, the shape it
keeps on a day-partitioned 100 TB events lake (SCALING.md)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from census_data_pipeline_spark import get_spark
from census_data_pipeline_spark.operators.attribution import touch_attribution
from census_data_pipeline_spark.operators.drift import ks_statistic, psi
from census_data_pipeline_spark.operators import quality as dq
from census_data_pipeline_spark.operators.outliers import robust_outliers
from census_data_pipeline_spark.sources.catalog import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(sf_dir: str = SF_DIR) -> int:
    spark = get_spark(app_name="events_analytics")
    ev = load_table(spark, sf_dir, "events")

    # 1. quality gate first: don't compute dashboards over broken data
    verdict = dq.dq_summary(
        dq.as_check(dq.uniqueness_violations(ev, ["event_id"]), "pk_unique"),
        dq.expect(ev, "ts_present", F.col("ts").isNotNull()),
        dq.expect(ev, "type_known",
                  F.col("event_type").isin("click", "view", "signup",
                                           "purchase", "error")),
    )
    rows = {r.check: r.n_violations for r in verdict.collect()}
    print(f"quality verdict       : {rows}")
    assert all(v == 0 for v in rows.values()), "gate failed"

    # 2. conversion funnel (view -> click -> purchase) and weekly cohorts
    steps = ["view", "click", "purchase"]
    per_step = (
        ev.filter(F.col("event_type").isin(*steps))
        .groupBy("user_id")
        .pivot("event_type", steps)
        .agg(F.min("ts"))
    )
    funnel = per_step.agg(
        F.count("view").alias("viewed"),
        F.count(F.when(F.col("click") > F.col("view"), 1)).alias("clicked"),
        F.count(F.when((F.col("purchase") > F.col("click"))
                       & (F.col("click") > F.col("view")), 1)).alias("bought"),
    ).first()
    print(f"funnel v->c->p        : {funnel.viewed} -> {funnel.clicked}"
          f" -> {funnel.bought}")

    # 3. attribution: credited revenue by last-touch channel
    att = touch_attribution(ev, lookback="7 days")
    credit = (
        att.groupBy("last_touch_type")
        .agg(F.round(F.sum("value"), 2).alias("revenue"),
             F.count("*").alias("n"))
        .orderBy(F.desc("revenue"))
    )
    print("last-touch credit     :")
    for r in credit.collect():
        print(f"  {r.last_touch_type}: {r.revenue} over {r.n} conversions")

    # 4. hourly OHLC bars + per-user time-weighted average baseline
    ohlc = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.min_by("value", F.struct("ts", "event_id")).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", F.struct("ts", "event_id")).alias("close"),
    )
    print(f"hourly OHLC bars      : {ohlc.count()}")

    # 5. robust outlier triage per event type (median/MAD, not mean/std)
    flagged = robust_outliers(ev, "value", ["event_type"]).filter(
        "is_outlier"
    )
    print(f"robust outliers       : {flagged.count()}")

    # 6. drift: do odd/even user segments see the same purchase values?
    purch = ev.filter(F.col("event_type") == "purchase")
    seg_a = purch.filter(F.col("user_id") % 2 == 0)
    seg_b = purch.filter(F.col("user_id") % 2 == 1)
    ks = ks_statistic(seg_a, seg_b, "value").first()
    headline_psi = psi(seg_a, seg_b, "value").agg(
        F.round(F.sum("contribution"), 6)
    ).first()[0]
    print(f"segment drift         : ks={ks.ks_stat} psi={headline_psi}")

    # NOTE: no spark.stop() — the session is shared when driven from tests
    return int(funnel.bought)


if __name__ == "__main__":
    main()

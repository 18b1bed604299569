"""Multi-state county comparison — the reference's second end-to-end
example (examples/multi_state_comparison.py:20-144) re-expressed on the
Spark engine: batch-fetch six states, broadcast-join state names, derive
rates, state-level multi-agg rollup, ordered summary, three top-5 lists,
CSV export.

The reference fans out a 4-thread pool and concatenates pandas frames; here
the per-state fetches are partitions of one lazy DataFrame and the rollup
is a single hash aggregate."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from census_data_pipeline_spark import CensusSparkPipeline, get_spark
from census_data_pipeline_spark.operators.joins import dim_lookup, states_dim
from census_data_pipeline_spark.operators.rates import calculate_rates
from census_data_pipeline_spark.operators.rollup import grouped_summary
from census_data_pipeline_spark.operators.topk import top_k
from examples.synthetic_source import synthetic_fetch

MIDWEST = ["17", "18", "26", "27", "39", "55"]  # IL IN MI MN OH WI

VARIABLES = {
    "B01003_001E": "total_population",
    "B19013_001E": "median_household_income",
    "B19301_001E": "per_capita_income",
    "B23025_003E": "labor_force",
    "B23025_005E": "unemployed",
    "B25077_001E": "median_home_value",
    "B17001_002E": "below_poverty",
}


def main(out_dir: str | None = None) -> int:
    out_dir = out_dir or tempfile.mkdtemp(prefix="multi_state_")
    spark = get_spark(app_name="multi_state_comparison")
    pipeline = CensusSparkPipeline(spark, fetch=synthetic_fetch)

    print("Batch-fetching county data for 6 Midwest states (synthetic)...")
    counties = pipeline.fetch_batch_states(VARIABLES, "county", MIDWEST, year=2022)
    counties = pipeline.clean_missing_values(counties, list(VARIABLES.values()))

    # state name lookup: broadcast dim join replaces the .map(dict).
    # Alias dim columns first — the fetched frame has NAME, and Spark's
    # case-insensitive resolution would collide it with the dim's `name`.
    dim = states_dim(spark).select(
        F.col("fips").alias("state"), F.col("name").alias("state_name")
    )
    counties = dim_lookup(counties, dim, on="state")

    counties = calculate_rates(
        counties,
        {
            "unemployment_rate": ("unemployed", "labor_force"),
            "poverty_rate": ("below_poverty", "total_population"),
        },
    )

    summary = grouped_summary(
        counties,
        ["state_name"],
        [
            ("sum", "total_population", "total_population"),
            ("median", "median_household_income", "median_income"),
            ("median", "median_home_value", "median_home_value"),
            ("mean", "unemployment_rate", "unemployment_rate"),
            ("mean", "poverty_rate", "poverty_rate"),
            ("count", "GEOID", "num_counties"),
        ],
    ).orderBy(F.desc("total_population"))

    print(f"\n{'State':<15}{'Population':>14}{'Counties':>10}"
          f"{'MedIncome':>12}{'Unemp%':>8}{'Pov%':>8}")
    for r in summary.collect():
        print(f"{r.state_name:<15}{r.total_population:>14,.0f}"
              f"{r.num_counties:>10}{r.median_income:>12,.0f}"
              f"{r.unemployment_rate:>8.1f}{r.poverty_rate:>8.1f}")

    for metric, label in [
        ("median_household_income", "Median Household Income"),
        ("unemployment_rate", "Unemployment Rate"),
        ("total_population", "Population"),
    ]:
        print(f"\nTop 5 Counties by {label}:")
        for r in top_k(counties, by=metric, k=5, tiebreak=["GEOID"]).collect():
            print(f"  {r.NAME}, {r.state_name}: {r[metric]:,.1f}")

    out = f"{out_dir}/midwest_counties_2022.csv"
    pipeline.export(counties, out, "csv")
    print(f"\nExported to {out}")
    return summary.count()


if __name__ == "__main__":
    main()

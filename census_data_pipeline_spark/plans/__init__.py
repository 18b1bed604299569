"""Query plans: the registry maps every implemented operator from
SURVEY.md §2 to (Spark callable, DuckDB oracle SQL)."""

from census_data_pipeline_spark.plans import (  # noqa: F401
    queries_analytics,
    queries_core,
    queries_ext,
)
from census_data_pipeline_spark.plans.registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]

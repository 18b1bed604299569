"""census_data_pipeline_spark — PySpark-native analytics engine with the
query/data-processing capabilities of tasnim966937/census-data-pipeline
(reference public API: src/__init__.py:29-42), re-architected for Spark
(lazy DataFrames, Catalyst, 100 TB-scale design) and extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns, event-time windows).
"""

from census_data_pipeline_spark.session import apply_runtime_confs, get_spark
from census_data_pipeline_spark.pipeline import CensusSparkPipeline

__all__ = [
    "get_spark",
    "apply_runtime_confs",
    "CensusSparkPipeline",
]

"""Custom stateful operator (applyInPandasWithState) driven through a real
streaming query; final state must equal the batch groupBy totals."""

from __future__ import annotations

import pytest

from census_data_pipeline_spark.sources.catalog import load_table
from census_data_pipeline_spark.streaming import windows
from census_data_pipeline_spark.streaming.stateful import running_user_totals


def test_running_totals_match_batch(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events")
    batch = load_table(spark, sf_dir, "events")
    batch.write.mode("overwrite").parquet(path)

    stream = windows.stream_from_parquet(spark, path, spark.read.parquet(path).schema)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode emits one row per key per batch; last emission per key
        # is the final state (single batch here -> exactly one row per key)
        got = {
            r.user_id: (r.n_events, round(r.total_value, 4))
            for r in spark.sql("SELECT * FROM stateful_out").collect()
        }
    finally:
        q.stop()

    from pyspark.sql import functions as F

    expected = {
        r.user_id: (r.n, round(r.t, 4))
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("t"),
        )
        .collect()
    }
    assert got == expected

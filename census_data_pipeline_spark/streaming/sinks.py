"""Streaming sinks (SURVEY.md §2.9 ⊕).

``start_parquet_stream``: stream → parquet via ``foreachBatch`` with an
idempotent per-epoch layout — each micro-batch overwrites its own
``_epoch=<id>`` partition directory, so a replayed epoch (after failure
recovery from the checkpoint) rewrites the same directory instead of
duplicating rows. This is the standard exactly-once-sink recipe for sinks
without transactional commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_parquet_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    query_name: str = "parquet_sink",
) -> StreamingQuery:
    """Write a streaming DataFrame to parquet idempotently."""

    def write_epoch(batch: DataFrame, epoch_id: int) -> None:
        batch.write.mode("overwrite").parquet(f"{path}/_epoch={epoch_id}")

    return (
        df.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def read_parquet_stream_output(spark, path: str) -> DataFrame:
    """Read back everything the sink has committed (all epochs)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path)

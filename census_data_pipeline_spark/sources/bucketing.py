"""Bucketed-table layout: the co-located join lever from SCALING.md.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem ⋈ orders,
q5) is the two-sided shuffle on the join key. Writing both tables
bucketed (and sorted) by that key pins rows to buckets by
``hash(key) % n``; a join between two tables bucketed the same way reads
bucket i against bucket i directly — **no Exchange on either side**
(asserted in tests/test_bucketing.py). The reference has no storage
layout control at all (eager pandas; src/census_pipeline.py:14-17); this
is pure engine-side design surface.

Bucket count guidance: ~(table size / target partition size), rounded to
a power of two shared by every table joining on the key, so bucket
pruning and co-location survive table growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    by ``key``. Requires a metastore-backed catalog (saveAsTable) — plain
    ``.parquet(path)`` writes cannot carry bucket metadata."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves bucket metadata (spark.table, not
    spark.read.parquet on the files — the latter loses bucketing)."""
    return spark.table(table)

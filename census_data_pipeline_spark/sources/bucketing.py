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

import os
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/z-order interleave of two non-negative integer cell indices
    (bit i of x -> bit 2i, bit i of y -> bit 2i+1). Pure codegen bit
    arithmetic — the standard multi-dimensional clustering key: sorting a
    table by z-value co-locates rows that are close in BOTH dimensions, so
    parquet row-group min/max stats prune 2-D range predicates that a sort
    on either single column could not."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms)


def zorder_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """ANSI-SQL replica of ``zorder_value`` (flat sum of masked shifts) for
    DuckDB oracles — identical integer arithmetic, engine-independent."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_expr} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y_expr} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write parquet clustered by z-order of (x_col, y_col): range-
    partition on the z-value (contiguous z-ranges per output file), sort
    within partitions, drop the helper column after the sort (order
    survives the projection). Re-reads with 2-D range predicates then
    prune whole files/row-groups via parquet column stats."""
    spark = df.sparkSession
    n = n_files or spark.sparkContext.defaultParallelism
    z = zorder_value(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    by ``key``. Requires a metastore-backed catalog (saveAsTable) — plain
    ``.parquet(path)`` writes cannot carry bucket metadata.

    Self-healing against orphaned warehouse directories: ``mode
    ("overwrite").saveAsTable`` refuses to adopt a location left behind
    by an aborted prior run whose metastore entry is gone
    (``LOCATION_ALREADY_EXISTS``), so the write first drops any
    metastore entry AND removes a location that exists on disk with no
    table backing it — an aborted run can never poison the next one."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    # resolve the REAL location from the catalog before dropping — the
    # naive <warehouse>/<last name component> guess is wrong for
    # db-qualified names (db.tbl lives at <warehouse>/db.db/tbl) and
    # would rmtree an unrelated default-database table's directory
    orphan = None
    was_external = False
    if spark.catalog.tableExists(table):
        info = {
            row[0]: row[1]
            for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        }
        # only MANAGED tables may be healed: DROP TABLE on an EXTERNAL
        # table intentionally preserves its data, and its location may be
        # a shared user directory — rmtree'ing it (or the default-location
        # fallback below) would delete user data the metastore never
        # owned (ADVICE r7)
        was_external = info.get("Type", "").upper() == "EXTERNAL"
        if not was_external:
            parsed = urlparse(info.get("Location", ""))
            if parsed.scheme in ("", "file"):
                orphan = parsed.path or info.get("Location")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a directory left by a crashed writer (no metastore row, so the
    # DESCRIBE above never saw it) would still block saveAsTable —
    # derive the DEFAULT managed location the metastore will assign,
    # db-aware and lowercased the way the metastore stores identifiers
    if orphan is None and not was_external:
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc = urlparse(warehouse)
        if loc.scheme in ("", "file"):
            base = loc.path or warehouse
            parts = [p.strip("`").lower() for p in table.split(".")]
            if len(parts) == 1 or (len(parts) == 2 and parts[0] == "default"):
                orphan = os.path.join(base, parts[-1])
            elif len(parts) == 2:
                orphan = os.path.join(base, parts[0] + ".db", parts[1])
            # >2 parts (catalog-qualified): location unknowable here —
            # leave healing to the writer's own error
    if orphan and os.path.isdir(orphan) and not spark.catalog.tableExists(table):
        shutil.rmtree(orphan, ignore_errors=True)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves bucket metadata (spark.table, not
    spark.read.parquet on the files — the latter loses bucketing)."""
    return spark.table(table)


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> dict:
    """Small-file compaction — the lake-maintenance job every streaming
    or incremental writer eventually needs: thousands of KB-sized
    parquet files (one per micro-batch/task) cost a listing + footer +
    task-schedule overhead per file at read time; compaction rewrites
    the SAME rows into ~``target_file_bytes`` files.

    File count is sized from the CURRENT on-disk bytes (a cheap driver
    listing, no data read); the rewrite is ``repartition(n)`` — or
    ``repartitionByRange(n, sort_col)`` + a per-partition sort when a
    clustering column is given, so compaction doubles as re-sorting and
    parquet min/max stats stay selective. The rewrite goes to a temp
    directory first and swaps in atomically-enough for a lake without a
    table format (Delta/Iceberg replace this dance with a metadata
    commit; the operator keeps the same surface so the swap is a
    one-line change there).

    Returns {files_before, files_after, bytes}."""
    if target_file_bytes < 1:
        raise ValueError("target_file_bytes must be >= 1")
    import glob as _glob
    import os
    import shutil

    files = [
        f for f in _glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True)
        if os.path.isfile(f)
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil div
    df = spark.read.parquet(path)
    if sort_col is not None:
        out = df.repartitionByRange(n_out, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = len([
        f for f in _glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True)
        if os.path.isfile(f)
    ])
    return {"files_before": len(files), "files_after": after,
            "bytes": total}

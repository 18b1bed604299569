"""Table catalog over the driver's parquet test lake.

The reference builds every table by fetching from a REST API and eagerly
materializing a pandas DataFrame (reference: src/census_pipeline.py:102-169).
Here the canonical storage is a parquet lake; scans are lazy DataFrames so
Catalyst gets predicate pushdown + column pruning for free on every query.

Scale notes (100 TB): each table would be a partitioned parquet/iceberg
dataset (e.g. lineitem partitioned by ship-month, events by day, documents
by source). The loader keeps a single entry point so partition-pruning
predicates stay expressible at the call site; nothing in the engine assumes
a single file per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from census_data_pipeline_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one lake table.

    ``events.ts`` has shipped in two physical forms across lake
    generations: INT64(TIMESTAMP_NANOS) (scans as LongType under
    ``nanosAsLong``) and TIMESTAMP_MICROS without UTC adjustment (scans as
    TIMESTAMP_NTZ). Both are normalized to session-zone TimestampType at
    microsecond precision — the session zone is pinned UTC, so the
    wall-clock reinterpretation is the identity and results stay
    comparable with the DuckDB oracle's naive-UTC timestamps.
    """
    apply_runtime_confs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if len(_TABLE_CACHE) > 256 or any(k[0] != key[0] for k in _TABLE_CACHE):
        _TABLE_CACHE.clear()  # stale sessions or unbounded growth
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division — double division loses bits at 1e18 ns scale
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


# DataFrames are immutable lazy plans, so handing every caller the same
# object per (session, lake, table) is semantically identical to a fresh
# spark.read — it just skips the per-call file listing + schema fetch
# (~0.13 s of py4j round-trips per read, paid by every query otherwise).
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a small single-file input up to the cluster's
    parallelism. Small parquet files scan as ONE partition, which serializes
    every downstream narrow transformation onto one core — fatal for
    CPU-heavy per-row work (hashing, shingling, vector math). At real scale
    inputs arrive multi-file and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # File count stands in for scan parallelism without the df.rdd hop
    # (which forces a plan->RDD conversion per call). Multi-file inputs at
    # or above the target are already parallel; anything else (few files,
    # or a non-file-backed frame) gets an explicit round-robin repartition
    # — harmless when small, necessary when CPU-bound downstream.
    files = df.inputFiles()
    if files and len(files) >= target:
        return df
    if not files:
        # Non-file-backed frame (in-memory, shuffled intermediate): fall
        # back to the physical partition count before forcing a shuffle —
        # a frame that already has enough partitions gains nothing from a
        # round-robin repartition.
        if df.rdd.getNumPartitions() >= target:
            return df
    return df.repartition(target)


def round_materialize(df: DataFrame, prior: DataFrame | None = None) -> DataFrame:
    """Round-boundary materialization for chained iterative frames
    (r12, shared by the graph community tier and the trained-in-engine
    fit loops). In this Spark build, a plan built ON TOP of a
    ``localCheckpoint`` dataset RECOMPUTES the checkpoint's lineage
    instead of reading its stored blocks (measured on the Louvain move
    chain: 5-8× growth per chained round — exponential in rounds;
    reliable ``checkpoint`` behaves the same on the consumer side).
    Routing consumers through ``persist`` fixes it — the cache manager
    rewrites consumer plans to InMemoryTableScan, which DOES reuse
    blocks (measured flat 1.1 s/round over 10 chained rounds) — while
    the lazy ``localCheckpoint`` underneath keeps the LOGICAL plan a
    flat LogicalRDD so per-round analysis stays O(1). One count
    materializes the blocks (the coreness one-bounded-action-per-round
    discipline); ``prior`` — the previous round's frame, when supplied
    — is unpersisted once the new frame is live, so cache residency
    stays O(one round's frames) at any round count."""
    out = df.localCheckpoint(eager=False).persist()
    out.count()
    if prior is not None:
        prior.unpersist()
    return out


def round_persist(df: DataFrame) -> DataFrame:
    """Lazy sibling of ``round_materialize`` (r14 — VERDICT r13 #1: the
    eager persist+count charged a full extra pass to frames with one
    effective consumer). Cut lineage and ``persist`` WITHOUT the eager
    count: the blocks materialize at the FIRST consuming action and
    every later consumer reads them (the cache manager rewrites consumer
    plans to InMemoryTableScan), so total compute is identical to
    ``round_materialize`` minus the up-front count job. Use for shared
    frames whose first consumer runs soon anyway (the query's own sink,
    or a local-tail gate count); keep ``round_materialize`` for
    iterative round boundaries, where the eager count IS the
    one-bounded-action-per-round discipline and the ``prior`` unpersist
    keeps cache residency O(one round)."""
    return df.localCheckpoint(eager=False).persist()


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all lake tables as temp views for the SQL surface
    (reference equivalent: the implicit pandas namespace; here it powers
    ``spark.sql`` — reference's exporters.execute_sql analog, exporters.py:197-204).
    """
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

"""Event-time windowing (SURVEY.md §2.9 ⊕).

The reference has zero streaming surface; its only temporal operator is the
batch snapshot join (transformers.py:233-277). The engine adds the standard
Structured Streaming trio — tumbling/sliding/session windows + watermark —
written **batch-first**: each helper takes any DataFrame (static parquet or
readStream) and applies identical event-time logic, so the DuckDB oracle can
verify the aggregation semantics in batch while the same code runs
streaming.

Scale: windowed aggregation shuffles on (window, keys) — with watermarking,
state is bounded by (watermark horizon / slide) per key. Session windows
use Spark's built-in session_window state merging.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _aggs(aggs: list[tuple[str, str, str]]) -> list[Column]:
    fns = {"count": F.count, "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}
    return [fns[fn](col).alias(alias) for fn, col, alias in aggs]


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> DataFrame:
    """Fixed windows: groupBy(window(ts, d), keys). Output flattens
    window.start/end to plain timestamp columns for sink/oracle friendliness."""
    out = (
        df.groupBy(F.window(ts_col, duration), *keys)
        .agg(*_aggs(aggs))
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("window", *keys)],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> DataFrame:
    """Overlapping windows: each event contributes to duration/slide windows."""
    out = (
        df.groupBy(F.window(ts_col, duration, slide), *keys)
        .agg(*_aggs(aggs))
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("window", *keys)],
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> DataFrame:
    """Session windows: events within ``gap`` of the previous event merge
    into one session per key. Batch-mode equivalent of streaming
    sessionization (oracle form: gaps-and-islands with lag + cumulative
    sum)."""
    out = (
        df.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*_aggs(aggs))
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        *keys,
        *[c for c in out.columns if c not in ("session_window", *keys)],
    )


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound; on a streaming frame this bounds window state and
    drops events later than ``delay`` past the max observed event time.
    On a batch frame it is a no-op passthrough of the same plan."""
    return df.withWatermark(ts_col, delay)


def dedup_in_stream(df: DataFrame, keys: list[str], ts_col: str,
                    delay: str) -> DataFrame:
    """Streaming dedup with bounded state
    (``dropDuplicatesWithinWatermark``); falls back to plain
    dropDuplicates on batch frames where the watermark variant is
    undefined."""
    wm = df.withWatermark(ts_col, delay)
    if df.isStreaming:
        return wm.dropDuplicatesWithinWatermark(keys)
    return wm.dropDuplicates(keys)


def stream_from_parquet(
    spark: SparkSession, path: str, schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream entry over a parquet directory — used by tests to drive
    the helpers above through a real streaming query (memory sink +
    processAllAvailable). ``max_files_per_trigger`` caps files per
    micro-batch so a staged directory replays as MANY batches (the
    production arrival shape) instead of one mega-batch."""
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stage_time_ordered_parquet(
    df: DataFrame, ts_col: str, directory: str, n_chunks: int = 8,
) -> list[str]:
    """Stage ``df`` into ``n_chunks`` parquet files holding DISJOINT,
    ascending ``ts_col`` ranges, with strictly increasing file mtimes so
    FileStreamSource replays them oldest-range-first. With
    ``maxFilesPerTrigger=1`` this reproduces production arrival order:
    the watermark advances between micro-batches, append-mode windows
    close incrementally, and state stays bounded by the active horizon
    instead of accumulating every window ever seen.

    Range-disjoint chunks also guarantee no late drops while replaying:
    after chunk i the watermark is max_ts(chunk i) − delay, strictly
    below chunk i+1's minimum ts."""
    import glob
    import os
    import shutil
    import time

    tmp = directory.rstrip("/") + "__ordered_tmp"
    (
        df.repartitionByRange(n_chunks, F.col(ts_col))
        .sortWithinPartitions(ts_col)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    os.makedirs(directory, exist_ok=True)
    # part-NNNNN numbering follows repartitionByRange partition index,
    # so lexicographic part order IS ascending ts-range order
    parts = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
    base = time.time() - 2.0 * len(parts) - 2.0
    staged = []
    for i, p in enumerate(parts):
        dst = os.path.join(directory, f"chunk-{i:05d}.parquet")
        shutil.move(p, dst)
        os.utime(dst, (base + 2.0 * i, base + 2.0 * i))
        staged.append(dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return staged

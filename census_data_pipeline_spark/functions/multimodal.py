"""Multimodal column plumbing (SURVEY.md §2.11 ⊕; north-star requirement).

Image/audio/video payloads are opaque ``BinaryType`` columns + typed
metadata structs. The Spark-side plumbing — schema, partitioning, Arrow
batch shape through ``mapInPandas`` — is real and tested; the actual media
decode is stubbed (image/audio libraries are not in this container) behind
a clearly-marked NotImplementedError with a deterministic fake used by
tests.

Scale: payloads stay columnar in parquet; feature extraction is an
embarrassingly parallel ``mapInPandas`` over Arrow batches (no shuffle),
with ``spark.sql.files.maxPartitionBytes`` sizing the batch working set.
``spark.read.format("binaryFile")`` is the ingestion path for loose media
files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = (
    "doc_id long, payload binary, media_type string, byte_len long, checksum string"
)

FEATURE_SCHEMA = "doc_id long, byte_len long, mean_byte double, n_zero long"


def ingest_binary_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Loose-media ingestion via ``spark.read.format("binaryFile")``
    (SURVEY.md §2.11): one row per file with (path, modificationTime,
    length, content), normalized to the engine's payload shape. Partition
    parallelism follows file count/size; at scale, pack small media files
    into parquet first (this reader is for raw landing zones)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.abs(F.xxhash64("path")).alias("doc_id"),
        F.col("path").alias("source_path"),
        F.col("content").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.col("length").cast("long").alias("byte_len"),
        F.sha2(F.col("content"), 256).alias("checksum"),
    )


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    media_type: str = "application/octet-stream",
) -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata —
    the canonical multimodal row shape (payload + media_type + byte_len +
    checksum)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("checksum"),
    )


def decode_image(payload: bytes) -> object:
    """STUB: real image decode requires PIL/opencv (not in this image).
    The engine's contract is: bytes in, HWC uint8 array out."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/opencv); "
        "not available in this container — plumbing is exercised via "
        "extract_fake_features"
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize: decode -> resample to (width, height) -> re-encode.
    The decode/resample core is the stubbed step (needs PIL/opencv — see
    decode_image); the deterministic fake keeps the first width*height
    payload bytes (zero-padded), so schema, metadata recompute (byte_len,
    checksum) and Arrow round-trip are exercised for real. 1 row in ->
    1 row out; no shuffle; partition-parallel."""
    out_schema = (
        "doc_id long, payload binary, media_type string, byte_len long, "
        "checksum string, width int, height int"
    )
    target = width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hashlib

        import pandas as _pd

        def fake_resize(b: bytes) -> bytes:
            body = bytes(b[:target])
            return body + b"\x00" * (target - len(body))

        for batch in batches:
            resized = batch["payload"].map(fake_resize)
            yield _pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "payload": resized,
                    "media_type": batch["media_type"],
                    "byte_len": resized.map(len),
                    "checksum": resized.map(
                        lambda b: _hashlib.sha256(b).hexdigest()
                    ),
                    "width": width,
                    "height": height,
                }
            )

    cols = df.select(
        "doc_id", "payload", "media_type"
    )
    return cols.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_n: int = 2
) -> DataFrame:
    """mapInPandas frame sampling: one input video payload fans out to one
    row per kept frame (row-expanding batch shape, the 1->N contract a
    real ffmpeg sampler needs). The frame decoder is the stubbed step; the
    deterministic fake slices the payload into fixed ``frame_bytes``
    chunks and keeps every ``every_n``-th. No shuffle; output rows carry
    (doc_id, frame_idx, frame payload, checksum)."""
    out_schema = "doc_id long, frame_idx long, frame binary, checksum string"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hashlib

        import pandas as _pd

        for batch in batches:
            ids, idxs, frames, sums = [], [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n_frames = max(len(payload) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    chunk = bytes(payload[fi * frame_bytes:(fi + 1) * frame_bytes])
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(chunk)
                    sums.append(_hashlib.sha256(chunk).hexdigest())
            yield _pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames,
                 "checksum": sums}
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=out_schema)


def extract_fake_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: deterministic
    byte-level statistics standing in for a real media decoder
    (decode_image) — the Spark plumbing (schema, Arrow batching,
    partition-parallelism) is identical.

    The batch function is a self-contained closure (imports pandas inside,
    references nothing module-level) so cloudpickle ships it BY VALUE —
    it runs on workers that cannot import this package."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for batch in batches:
            payloads = batch["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "byte_len": payloads.map(len),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "n_zero": payloads.map(lambda b: sum(1 for x in b if x == 0)),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)

"""Sinks (reference: src/exporters.py).

Format dispatch mirroring ``DataExporter.export`` (exporters.py:29-63):
csv / geojson / parquet / json are native distributed writers; geopackage
and shapefile have no Spark writer — they are small-result driver-side
paths gated behind a geopandas import (absent in this image → clear
NotImplementedError, per SURVEY.md §2.1 K2/K4). JDBC covers the PostGIS
sink (exporters.py:120-195) with mode mapping fail/replace/append →
error/overwrite/append.

Scale: parquet is the canonical sink (columnar, partitionable,
predicate-pushdown on re-read). CSV drops the geometry column first —
same contract as the reference (exporters.py:65-69).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_JDBC_MODES = {"fail": "error", "replace": "overwrite", "append": "append"}


def export(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    layer_name: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Format dispatcher (reference: src/exporters.py:29-63;
    pipeline facade census_pipeline.py:324-341)."""
    fmt = fmt.lower()

    def _writer(frame):
        w = frame.write.mode(mode)
        return w.partitionBy(*partition_by) if partition_by else w

    if fmt == "csv":
        # reference drops geometry before CSV (exporters.py:65-69); the
        # binary/encoding companions are dropped whenever present (CSV
        # cannot carry BinaryType)
        geo_cols = [
            c for c in ("geometry", "geometry_bytes", "geometry_encoding")
            if c in df.columns
        ]
        out = df.drop(*geo_cols) if geo_cols else df
        _writer(out).option("header", True).csv(path)
    elif fmt == "parquet":
        _writer(df).parquet(path)
    elif fmt == "orc":
        # columnar alternative with the same predicate-pushdown /
        # column-pruning story as parquet (ORC is bundled in Spark; the
        # reference has no columnar sink at all)
        _writer(df).orc(path)
    elif fmt == "json":
        _writer(df).json(path)
    elif fmt == "geojson":
        _writer(to_geojson(df)).text(path)
    elif fmt in ("geopackage", "gpkg", "shapefile", "shp"):
        _driver_side_geo_export(df, path, fmt, layer_name)
    else:
        raise ValueError(f"unsupported format: {fmt!r}")


def to_geojson(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """GeoJSON Feature per row (reference: src/exporters.py:84-93): geometry
    WKT is carried verbatim in properties-level form; a full RFC 7946
    geometry object requires a WKT->GeoJSON geometry parser (Sedona's
    ST_AsGeoJSON at scale). Distributed text sink — one Feature per line
    (newline-delimited GeoJSON)."""
    props = [
        c for c in df.columns
        if c not in (geometry_col, "geometry_bytes", "geometry_encoding")
    ]
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(*[F.col(c).alias(c) for c in props]).alias("properties"),
            F.col(geometry_col).alias("geometry_wkt"),
        )
    )
    return df.select(feature.alias("value"))


def _driver_side_geo_export(df: DataFrame, path: str, fmt: str,
                            layer_name: str | None) -> None:
    """K2/K4: GPKG & shapefile sinks (reference: src/exporters.py:71-106).

    These formats have no distributed Spark writer, so this is explicitly
    the small-result path: collect to the driver, rebuild a GeoDataFrame
    from the WKT ``geometry`` column, and hand off to geopandas — layer
    name defaults to the output file's stem (reference ``path.stem``), and
    shapefile export warns about the format's 10-char field-name
    truncation, both matching the reference. Uses geopandas' battle-tested
    drivers when the library is present (reference parity); otherwise
    falls back to the engine's pure-stdlib GeoPackage (sqlite3) and
    shapefile (struct) writers in ``geo_formats`` — same files, no
    dependency, round-trip-tested in tests/test_geo_formats.py."""
    import os
    import warnings

    try:
        import geopandas
        from shapely import wkt as shapely_wkt
    except ImportError:
        if "geometry" not in df.columns:
            raise ValueError(f"{fmt} export requires a WKT 'geometry' column")
        from census_data_pipeline_spark.sources import geo_formats

        slim = df.drop(
            *[c for c in ("geometry_bytes", "geometry_encoding")
              if c in df.columns]
        )
        rows = [tuple(r) for r in slim.collect()]
        if fmt in ("shapefile", "shp"):
            long_cols = [c for c in slim.columns
                         if len(c) > 10 and c != "geometry"]
            warnings.warn(
                "Shapefile format truncates column names to 10 characters"
                + (f": {long_cols}" if long_cols else ""),
                stacklevel=3,
            )
            geo_formats.write_shapefile(path, slim.columns, rows)
        else:
            layer = layer_name or os.path.splitext(os.path.basename(path))[0]
            geo_formats.write_gpkg(path, layer, slim.columns, rows)
        return

    if "geometry" not in df.columns:
        raise ValueError(f"{fmt} export requires a WKT 'geometry' column")
    pdf = df.drop(
        *[c for c in ("geometry_bytes", "geometry_encoding") if c in df.columns]
    ).toPandas()
    geoms = [shapely_wkt.loads(w) if w is not None else None
             for w in pdf.pop("geometry")]
    gdf = geopandas.GeoDataFrame(pdf, geometry=geoms, crs="EPSG:4269")
    if fmt in ("shapefile", "shp"):
        # reference warns unconditionally (exporters.py:105); surface the
        # affected columns so the caller can rename instead of colliding
        long_cols = [c for c in gdf.columns if len(c) > 10 and c != "geometry"]
        warnings.warn(
            "Shapefile format truncates column names to 10 characters"
            + (f": {long_cols}" if long_cols else ""),
            stacklevel=3,
        )
        gdf.to_file(path, driver="ESRI Shapefile")
    else:
        layer = layer_name or os.path.splitext(os.path.basename(path))[0]
        gdf.to_file(path, driver="GPKG", layer=layer)


def to_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    if_exists: str = "fail",
    properties: dict[str, str] | None = None,
    schema: str | None = None,
) -> None:
    """PostGIS/JDBC sink (reference: src/exporters.py:120-195). Geometry
    travels in ``geometry_bytes``; the server-side promotion post-step
    (exporters.py:171-180 equivalent, run by the caller via
    ``execute_sql``) must dispatch on ``geometry_encoding``:
    ``ST_GeomFromText`` for 'wkt-utf8' rows, ``ST_GeomFromWKB`` for
    'wkb'. ``schema`` qualifies the target table (reference
    ``to_postgis(schema=...)``). Round-trip exercised for real against
    Spark's bundled embedded Derby in tests/test_sources.py."""
    if if_exists not in _JDBC_MODES:
        raise ValueError(f"if_exists must be one of {sorted(_JDBC_MODES)}")
    qualified = f"{schema}.{table}" if schema else table
    df.write.jdbc(url, qualified, mode=_JDBC_MODES[if_exists],
                  properties=properties or {})


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Companion reader so JDBC round-trips stay inside the engine API."""
    return spark.read.jdbc(url, table, properties=properties or {})


def execute_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Raw SQL passthrough (reference: src/exporters.py:197-204) against the
    engine's own catalog."""
    return spark.sql(sql)


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    text_col: str = "text",
) -> DataFrame:
    """Training-data export — the final mile of the curation pipeline:
    write the mixed/sharded corpus as shard-partitioned JSONL (the
    format training loaders consume: one JSON document per line,
    ``path/<shard_col>=N/*.json``) plus a MANIFEST dataframe
    (shard, n_docs, n_tokens, sha_xor) that is also persisted at
    ``path/_manifest`` — a loader can verify shard completeness without
    reading payloads.

    ``sha_xor`` is an order-independent per-shard content fingerprint:
    ``bit_xor`` of the first 8 md5 bytes of each document — any
    dropped/duplicated/corrupted line changes it, and it is computable
    identically by any engine (no dependence on file layout or row
    order, which Spark does not guarantee).

    Scale shape: ONE pass writes the data (partitionBy on the shard
    column → one directory per shard, executor-parallel), one
    shard-keyed aggregate builds the manifest. No driver-side rows."""
    out = df.write.partitionBy(shard_col).mode("overwrite")
    out.json(path)
    manifest = (
        df.groupBy(shard_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col(text_col), " ")))
            .cast("long").alias("n_tokens"),
            F.bit_xor(
                F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10)
                .cast("long")
            ).alias("sha_xor"),
        )
    )
    manifest.write.mode("overwrite").parquet(path + "/_manifest")
    return manifest


def read_training_shards(
    spark: SparkSession, path: str, verify: bool = True
) -> DataFrame:
    """Load a ``write_training_shards`` export. With ``verify=True``
    (default) the per-shard (count, fingerprint) is recomputed from the
    loaded data and compared against the stored manifest — a missing
    file, truncated shard, or corrupted line raises instead of silently
    training on a damaged corpus."""
    data = spark.read.json(path)
    if verify:
        stored = {
            r[0]: (r[1], r[2], r[3])
            for r in spark.read.parquet(path + "/_manifest").collect()
        }
        got = {
            r[0]: (r[1], r[2], r[3])
            for r in (
                data.groupBy("shard")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum(F.size(F.split(F.col("text"), " ")))
                    .cast("long").alias("n_tokens"),
                    F.bit_xor(
                        F.conv(
                            F.substring(F.md5(F.col("text")), 1, 15), 16, 10
                        ).cast("long")
                    ).alias("sha_xor"),
                )
                .collect()
            )
        }
        if stored != got:
            bad = {k for k in set(stored) | set(got)
                   if stored.get(k) != got.get(k)}
            raise ValueError(
                f"training-shard manifest mismatch for shards {sorted(bad)}: "
                "the export is incomplete or corrupted"
            )
    return data

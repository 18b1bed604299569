"""Round-trips for the pure-stdlib GeoPackage / shapefile sinks
(K2/K4; reference src/exporters.py:71-106). Unlike the geopandas-gated
test, these always execute — the writers are stdlib-only."""

from __future__ import annotations

import sqlite3
import struct

import pytest

from census_data_pipeline_spark.sources import geo_formats as gf
from census_data_pipeline_spark.sources.exporters import export

WKTS = [
    "POINT (1 2)",
    "POINT (-77.03 38.9)",
    "LINESTRING (0 0, 1 1, 2 0.5)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    # with a hole
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
    "MULTIPOINT (1 1, 2 2)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
    "((5 5, 8 5, 8 8, 5 8, 5 5), (6 6, 6 7, 7 7, 7 6, 6 6)))",
]


def _canon(wkt: str):
    return gf.parse_wkt(wkt)


@pytest.mark.parametrize("wkt", WKTS)
def test_wkb_round_trip(wkt):
    assert _canon(gf.wkb_to_wkt(gf.wkt_to_wkb(wkt))) == _canon(wkt)


def test_wkb_big_endian_decode():
    # flip a little-endian POINT to big-endian by hand
    x, y = 3.25, -1.5
    buf = struct.pack(">BIdd", 0, 1, x, y)
    assert gf.wkb_to_wkt(buf) == "POINT (3.25 -1.5)"


def test_multipoint_unparenthesized_variant():
    a = gf.parse_wkt("MULTIPOINT (1 2, 3 4)")
    b = gf.parse_wkt("MULTIPOINT ((1 2), (3 4))")
    assert a == b


def test_wkt_envelope():
    assert gf.wkt_envelope("LINESTRING (0 5, 2 -1, 1 3)") == (0, 2, -1, 5)


def test_gpkg_round_trip(tmp_path):
    path = str(tmp_path / "out.gpkg")
    cols = ["GEOID", "name", "pop", "density", "geometry"]
    rows = [
        ("06001", "Alameda", 1600000, 620.5, WKTS[3]),
        ("06075", "San Francisco", 870000, 7200.25, WKTS[4]),
        ("06", "California", 39000000, None, WKTS[7]),
        ("00", "nowhere", None, 1.0, None),
    ]
    gf.write_gpkg(path, "counties", cols, rows, srs_id=4269)

    out_cols, out_rows = gf.read_gpkg(path, "counties")
    assert set(out_cols) == set(cols)
    # reorder read-back to the writer's column order
    idx = [out_cols.index(c if c != "geometry" else "geometry") for c in cols]
    remapped = sorted((tuple(r[i] for i in idx) for r in out_rows), key=repr)
    for got, want in zip(remapped, sorted(rows, key=repr)):
        for g, w in zip(got, want):
            if isinstance(w, str) and w.startswith(("POINT", "LINE", "POLY",
                                                    "MULTI")):
                assert _canon(g) == _canon(w)
            else:
                assert g == w


def test_gpkg_is_valid_geopackage(tmp_path):
    """The file must satisfy the spec's core requirements: application_id
    'GPKG', the three registry tables, a registered geometry column, and
    a parseable GP-header blob."""
    path = str(tmp_path / "v.gpkg")
    gf.write_gpkg(path, "layer1", ["id", "geometry"], [(1, WKTS[0])])
    con = sqlite3.connect(path)
    try:
        (app_id,) = con.execute("PRAGMA application_id").fetchone()
        assert app_id == 0x47504B47
        tables = {
            r[0] for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        }
        assert {"gpkg_spatial_ref_sys", "gpkg_contents",
                "gpkg_geometry_columns", "layer1"} <= tables
        gc = con.execute("SELECT * FROM gpkg_geometry_columns").fetchall()
        assert gc == [("layer1", "geom", "POINT", 4269, 0, 0)]
        (blob,) = con.execute("SELECT geom FROM layer1").fetchone()
        assert blob[:2] == b"GP"
        assert gf.gpkg_parse_blob(blob) == WKTS[0]
        # contents row carries the layer envelope
        row = con.execute(
            "SELECT data_type, min_x, min_y, max_x, max_y, srs_id"
            " FROM gpkg_contents WHERE table_name='layer1'"
        ).fetchone()
        assert row == ("features", 1.0, 2.0, 1.0, 2.0, 4269)
    finally:
        con.close()


def test_gpkg_layer_replace_and_multilayer(tmp_path):
    path = str(tmp_path / "m.gpkg")
    gf.write_gpkg(path, "a", ["id", "geometry"], [(1, WKTS[0])])
    gf.write_gpkg(path, "b", ["id", "geometry"], [(2, WKTS[2])])
    gf.write_gpkg(path, "a", ["id", "geometry"], [(9, WKTS[1])])  # replace
    _, rows_a = gf.read_gpkg(path, "a")
    _, rows_b = gf.read_gpkg(path, "b")
    assert [r[1] for r in rows_a] == [9]
    assert [r[1] for r in rows_b] == [2]
    with pytest.raises(ValueError):
        gf.read_gpkg(path)  # ambiguous: two layers


@pytest.mark.parametrize("wkt", WKTS)
def test_shapefile_geometry_round_trip(tmp_path, wkt):
    path = str(tmp_path / "g.shp")
    gf.write_shapefile(path, ["id", "geometry"], [(1, wkt)])
    cols, rows = gf.read_shapefile(path)
    assert cols == ["geometry", "id"]
    name_in, coords_in = gf.parse_wkt(wkt)
    name_out, coords_out = gf.parse_wkt(rows[0][0])
    if name_in in ("POINT", "MULTIPOINT"):
        assert (name_out, coords_out) == (name_in, coords_in)
    else:
        # ring orientation / closure may be normalized: compare point SETS
        pts_in = set(gf._all_points(name_in, coords_in))
        pts_out = set(gf._all_points(name_out, coords_out))
        assert pts_out == pts_in


def test_shapefile_attributes_round_trip(tmp_path):
    path = str(tmp_path / "a.shp")
    cols = ["a_very_long_column_name", "count", "ratio", "geometry"]
    rows = [
        ("hello", 42, 3.5, "POINT (0 0)"),
        ("world", -7, -0.25, "POINT (1 1)"),
        (None, None, None, "POINT (2 2)"),
    ]
    gf.write_shapefile(path, cols, rows)
    out_cols, out_rows = gf.read_shapefile(path)
    assert out_cols == ["geometry", "a_very_lon", "count", "ratio"]
    assert out_rows[0][1:] == ("hello", 42, 3.5)
    assert out_rows[1][1:] == ("world", -7, -0.25)
    assert out_rows[2][1:] == ("", None, None)


def test_shapefile_shx_index_consistent(tmp_path):
    path = str(tmp_path / "i.shp")
    gf.write_shapefile(
        path, ["id", "geometry"],
        [(i, f"POINT ({i} {i})") for i in range(5)],
    )
    with open(str(tmp_path / "i.shx"), "rb") as f:
        shx = f.read()
    with open(path, "rb") as f:
        shp = f.read()
    assert len(shx) == 100 + 8 * 5
    for n in range(5):
        off_w, len_w = struct.unpack_from(">ii", shx, 100 + 8 * n)
        rec_no, rec_len = struct.unpack_from(">ii", shp, off_w * 2)
        assert rec_no == n + 1
        assert rec_len == len_w


def test_polygon_ring_orientation(tmp_path):
    """Outer rings must come back clockwise from the writer (spec), holes
    counter-clockwise — regardless of input orientation."""
    path = str(tmp_path / "o.shp")
    ccw_outer = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"
    gf.write_shapefile(path, ["id", "geometry"], [(1, ccw_outer)])
    with open(path, "rb") as f:
        shp = f.read()
    n_parts, n_pts = struct.unpack_from("<ii", shp, 108 + 36)
    assert n_parts == 2
    offs = struct.unpack_from("<2i", shp, 108 + 44)
    flat = struct.unpack_from(f"<{2 * n_pts}d", shp, 108 + 52)
    pts = [(flat[i], flat[i + 1]) for i in range(0, 2 * n_pts, 2)]
    outer = pts[offs[0]:offs[1]]
    hole = pts[offs[1]:]
    assert gf._signed_area(outer) < 0  # clockwise
    assert gf._signed_area(hole) > 0  # counter-clockwise


def test_export_geo_spark_round_trip(tmp_path, spark):
    """The public K2/K4 sink path executes end-to-end in this image (no
    geopandas): Spark DataFrame -> file -> stdlib read-back."""
    df = spark.createDataFrame(
        [("06001", 100, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
         ("06075", 200, "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))")],
        "GEOID string, total_population int, geometry string",
    )
    gpkg = str(tmp_path / "counties.gpkg")
    export(df, gpkg, "geopackage")
    cols, rows = gf.read_gpkg(gpkg, "counties")
    assert len(rows) == 2
    assert {r[cols.index("GEOID")] for r in rows} == {"06001", "06075"}

    shp = str(tmp_path / "counties.shp")
    with pytest.warns(UserWarning, match="truncates column names"):
        export(df, shp, "shapefile")
    cols2, rows2 = gf.read_shapefile(shp)
    assert len(rows2) == 2
    assert "total_popu" in cols2


# -- property tests -------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _coord = st.floats(
        min_value=-1e6, max_value=1e6,
        allow_nan=False, allow_infinity=False,
    )
    _point = st.tuples(_coord, _coord)
    _ring = st.lists(_point, min_size=3, max_size=8).map(
        lambda pts: pts + [pts[0]]
    )

    @st.composite
    def _wkt_geometry(draw):
        kind = draw(st.sampled_from(
            ["POINT", "LINESTRING", "POLYGON", "MULTIPOLYGON"]
        ))
        if kind == "POINT":
            return gf.unparse_wkt("POINT", draw(_point))
        if kind == "LINESTRING":
            return gf.unparse_wkt(
                "LINESTRING", draw(st.lists(_point, min_size=2, max_size=6))
            )
        if kind == "POLYGON":
            return gf.unparse_wkt(
                "POLYGON", draw(st.lists(_ring, min_size=1, max_size=3))
            )
        return gf.unparse_wkt(
            "MULTIPOLYGON",
            draw(st.lists(st.lists(_ring, min_size=1, max_size=2),
                          min_size=1, max_size=3)),
        )

    @settings(max_examples=200, deadline=None)
    @given(_wkt_geometry())
    def test_wkb_round_trip_property(wkt):
        assert gf.parse_wkt(gf.wkb_to_wkt(gf.wkt_to_wkb(wkt))) == \
            gf.parse_wkt(wkt)

    @settings(max_examples=100, deadline=None)
    @given(_wkt_geometry())
    def test_gpkg_blob_round_trip_property(wkt):
        blob = gf.gpkg_geometry_blob(wkt, srs_id=4326)
        assert gf.parse_wkt(gf.gpkg_parse_blob(blob)) == gf.parse_wkt(wkt)

except ImportError:  # pragma: no cover - hypothesis is in the image
    pass

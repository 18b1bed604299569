"""Pure-stdlib geospatial file formats: WKT<->WKB codec, OGC GeoPackage
writer/reader (``sqlite3``), and ESRI shapefile writer/reader (``struct``).

Why this exists: the reference writes GeoPackage and shapefile sinks
through geopandas/fiona drivers (reference: src/exporters.py:71-106).
This image has no geopandas, so for three rounds those two sinks were
real code that never executed (the gated round-trip test skipped). Both
formats are fully specified public standards writable with the stdlib —
GeoPackage is a SQLite database with three registry tables and a binary
geometry header (OGC 12-128r17); shapefile is three fixed-layout binary
files (ESRI whitepaper, 1998). This module implements the subset the
engine emits — 2-D POINT / LINESTRING / POLYGON and their MULTI forms —
so the K2/K4 sinks round-trip for real with no third-party dependency.

Driver-side by design: these sinks are the small-result path (same
contract as the geopandas route — collect, then write one file). The
distributed sinks remain parquet/GeoJSON/JDBC.
"""

from __future__ import annotations

import math
import re
import sqlite3
import struct

# ---------------------------------------------------------------------------
# WKT <-> WKB codec (2-D, little-endian WKB)
# ---------------------------------------------------------------------------

_WKB_TYPES = {
    "POINT": 1,
    "LINESTRING": 2,
    "POLYGON": 3,
    "MULTIPOINT": 4,
    "MULTILINESTRING": 5,
    "MULTIPOLYGON": 6,
}
_WKB_NAMES = {v: k for k, v in _WKB_TYPES.items()}


def _parse_nested(body: str):
    """Parse a WKT coordinate body — balanced parens over comma-separated
    ``x y`` pairs — into nested lists of (x, y) tuples, one nesting level
    per paren level."""
    pos = 0

    def parse_group():
        nonlocal pos
        assert body[pos] == "("
        pos += 1
        items = []
        while True:
            while pos < len(body) and body[pos] in " \t":
                pos += 1
            if pos >= len(body):
                raise ValueError("unbalanced WKT parentheses")
            if body[pos] == "(":
                items.append(parse_group())
            else:
                start = pos
                while pos < len(body) and body[pos] not in ",)":
                    pos += 1
                token = body[start:pos].strip()
                parts = token.split()
                if len(parts) < 2:
                    raise ValueError(f"bad WKT coordinate {token!r}")
                items.append((float(parts[0]), float(parts[1])))
            while pos < len(body) and body[pos] in " \t":
                pos += 1
            if body[pos] == ",":
                pos += 1
                continue
            if body[pos] == ")":
                pos += 1
                return items
            raise ValueError(f"unexpected char {body[pos]!r} in WKT")

    out = parse_group()
    if body[pos:].strip():
        raise ValueError(f"trailing WKT content {body[pos:]!r}")
    return out


def parse_wkt(wkt: str) -> tuple[str, list]:
    """``(type_name, coords)`` where coords nesting matches the type:
    POINT -> (x, y); LINESTRING/MULTIPOINT -> [(x, y), ...];
    POLYGON/MULTILINESTRING -> [[(x, y), ...], ...];
    MULTIPOLYGON -> [[[(x, y), ...], ...], ...]."""
    s = wkt.strip()
    head_end = s.find("(")
    if head_end == -1:
        head, rest = s, "EMPTY"
    else:
        head, rest = s[:head_end], s[head_end:]
    name = re.sub(r"\s*(ZM|Z|M)\s*$", "", head.strip().upper())
    if name not in _WKB_TYPES:
        raise ValueError(f"unsupported WKT type {head.strip()!r}")
    if rest.strip().upper() == "EMPTY":
        raise ValueError(f"empty geometry not supported: {wkt!r}")
    coords = _parse_nested(rest.strip())
    if name == "POINT":
        if len(coords) != 1 or not isinstance(coords[0], tuple):
            raise ValueError(f"bad POINT body {wkt!r}")
        return name, coords[0]
    if name == "MULTIPOINT":
        # both MULTIPOINT (1 2, 3 4) and MULTIPOINT ((1 2), (3 4)) are legal
        flat = [c[0] if isinstance(c, list) else c for c in coords]
        return name, flat
    return name, coords


def _fmt_num(v: float) -> str:
    if math.isfinite(v) and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_ring(pts) -> str:
    return "(" + ", ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in pts) + ")"


def unparse_wkt(name: str, coords) -> str:
    if name == "POINT":
        x, y = coords
        return f"POINT ({_fmt_num(x)} {_fmt_num(y)})"
    if name in ("LINESTRING", "MULTIPOINT"):
        return f"{name} {_fmt_ring(coords)}"
    if name in ("POLYGON", "MULTILINESTRING"):
        return f"{name} (" + ", ".join(_fmt_ring(r) for r in coords) + ")"
    if name == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(_fmt_ring(r) for r in poly) + ")"
            for poly in coords
        ) + ")"
    raise ValueError(f"unsupported geometry type {name!r}")


def wkt_to_wkb(wkt: str) -> bytes:
    """Little-endian 2-D WKB for the supported geometry types."""
    name, coords = parse_wkt(wkt)
    return _encode_wkb(name, coords)


def _pts(pts) -> bytes:
    out = [struct.pack("<I", len(pts))]
    out += [struct.pack("<dd", x, y) for x, y in pts]
    return b"".join(out)


def _encode_wkb(name: str, coords) -> bytes:
    t = _WKB_TYPES[name]
    head = struct.pack("<BI", 1, t)
    if name == "POINT":
        return head + struct.pack("<dd", *coords)
    if name == "LINESTRING":
        return head + _pts(coords)
    if name == "POLYGON":
        return head + struct.pack("<I", len(coords)) + b"".join(
            _pts(r) for r in coords
        )
    if name == "MULTIPOINT":
        return head + struct.pack("<I", len(coords)) + b"".join(
            _encode_wkb("POINT", p) for p in coords
        )
    if name == "MULTILINESTRING":
        return head + struct.pack("<I", len(coords)) + b"".join(
            _encode_wkb("LINESTRING", ls) for ls in coords
        )
    if name == "MULTIPOLYGON":
        return head + struct.pack("<I", len(coords)) + b"".join(
            _encode_wkb("POLYGON", p) for p in coords
        )
    raise ValueError(name)


def _read_pts(buf: bytes, pos: int, endian: str):
    (n,) = struct.unpack_from(endian + "I", buf, pos)
    pos += 4
    pts = list(struct.unpack_from(endian + "d" * (2 * n), buf, pos))
    pos += 16 * n
    return [(pts[i], pts[i + 1]) for i in range(0, 2 * n, 2)], pos


def _decode_wkb(buf: bytes, pos: int = 0):
    byte_order = buf[pos]
    endian = "<" if byte_order == 1 else ">"
    (t,) = struct.unpack_from(endian + "I", buf, pos + 1)
    pos += 5
    t &= 0xFF  # mask EWKB / ISO Z-M high bits; 2-D payloads only
    name = _WKB_NAMES.get(t)
    if name is None:
        raise ValueError(f"unsupported WKB geometry type {t}")
    if name == "POINT":
        x, y = struct.unpack_from(endian + "dd", buf, pos)
        return name, (x, y), pos + 16
    if name == "LINESTRING":
        pts, pos = _read_pts(buf, pos, endian)
        return name, pts, pos
    if name == "POLYGON":
        (nr,) = struct.unpack_from(endian + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nr):
            r, pos = _read_pts(buf, pos, endian)
            rings.append(r)
        return name, rings, pos
    # multi types: each member is a full nested WKB geometry
    (n,) = struct.unpack_from(endian + "I", buf, pos)
    pos += 4
    members = []
    for _ in range(n):
        _, c, pos = _decode_wkb(buf, pos)
        members.append(c)
    return name, members, pos


def wkb_to_wkt(buf: bytes) -> str:
    name, coords, pos = _decode_wkb(bytes(buf), 0)
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing WKB bytes")
    return unparse_wkt(name, coords)


def _all_points(name: str, coords):
    if name == "POINT":
        return [coords]
    if name in ("LINESTRING", "MULTIPOINT"):
        return list(coords)
    if name in ("POLYGON", "MULTILINESTRING"):
        return [p for ring in coords for p in ring]
    return [p for poly in coords for ring in poly for p in ring]


def wkt_envelope(wkt: str) -> tuple[float, float, float, float]:
    name, coords = parse_wkt(wkt)
    pts = _all_points(name, coords)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), max(xs), min(ys), max(ys)


# ---------------------------------------------------------------------------
# GeoPackage (OGC 12-128r17) via stdlib sqlite3
# ---------------------------------------------------------------------------

_GPKG_APPLICATION_ID = 0x47504B47  # 'GPKG'
_GPKG_USER_VERSION = 10301  # GeoPackage 1.3.1

_SRS_ROWS = [
    # (name, srs_id, organization, org_id, definition)
    ("Undefined Cartesian SRS", -1, "NONE", -1, "undefined"),
    ("Undefined Geographic SRS", 0, "NONE", 0, "undefined"),
    (
        "WGS 84",
        4326,
        "EPSG",
        4326,
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
    ),
    (
        "NAD83",
        4269,
        "EPSG",
        4269,
        'GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
        'SPHEROID["GRS 1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
    ),
]


def gpkg_geometry_blob(wkt: str, srs_id: int) -> bytes:
    """GeoPackage binary: 'GP' magic, version 0, flags (little-endian
    header, XY envelope), srs_id, envelope, then standard WKB."""
    min_x, max_x, min_y, max_y = wkt_envelope(wkt)
    flags = (1 << 1) | 1  # envelope indicator 1 (xy) | little-endian
    header = b"GP" + struct.pack("<BB", 0, flags) + struct.pack("<i", srs_id)
    envelope = struct.pack("<4d", min_x, max_x, min_y, max_y)
    return header + envelope + wkt_to_wkb(wkt)


def gpkg_parse_blob(blob: bytes) -> str:
    """WKT from a GeoPackage binary geometry (any envelope indicator)."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    envelope_ind = (flags >> 1) & 0b111
    n_doubles = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}[envelope_ind]
    return wkb_to_wkt(blob[8 + 8 * n_doubles:])


def _sql_type(values) -> str:
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            return "BOOLEAN"
        if isinstance(v, int):
            return "INTEGER"
        if isinstance(v, float):
            return "REAL"
        if isinstance(v, (bytes, bytearray)):
            return "BLOB"
        return "TEXT"
    return "TEXT"


def _quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def write_gpkg(
    path: str,
    layer: str,
    columns: list[str],
    rows: list[tuple],
    geometry_col: str = "geometry",
    srs_id: int = 4269,
) -> None:
    """Write one feature layer to a GeoPackage file. ``columns`` names the
    fields of each row tuple; the ``geometry_col`` entry holds WKT text
    (matching the engine's geometry carriage) and is stored as a GPKG
    binary geometry column named ``geom``. Appends the layer to an
    existing GeoPackage; replaces the layer if it already exists."""
    if geometry_col not in columns:
        raise ValueError(f"geometry column {geometry_col!r} not in columns")
    gi = columns.index(geometry_col)
    attrs = [(i, c) for i, c in enumerate(columns) if i != gi]

    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute(f"PRAGMA application_id = {_GPKG_APPLICATION_ID}")
        cur.execute(f"PRAGMA user_version = {_GPKG_USER_VERSION}")
        cur.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
                 srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
                 organization TEXT NOT NULL,
                 organization_coordsys_id INTEGER NOT NULL,
                 definition TEXT NOT NULL, description TEXT)"""
        )
        cur.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys "
            "(srs_name, srs_id, organization, organization_coordsys_id,"
            " definition) VALUES (?, ?, ?, ?, ?)",
            _SRS_ROWS,
        )
        cur.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_contents (
                 table_name TEXT NOT NULL PRIMARY KEY,
                 data_type TEXT NOT NULL, identifier TEXT UNIQUE,
                 description TEXT DEFAULT '',
                 last_change DATETIME NOT NULL DEFAULT
                   (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
                 min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
                 srs_id INTEGER)"""
        )
        cur.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
                 table_name TEXT NOT NULL, column_name TEXT NOT NULL,
                 geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
                 z TINYINT NOT NULL, m TINYINT NOT NULL,
                 CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
        )

        lq = _quote_ident(layer)
        cur.execute(f"DROP TABLE IF EXISTS {lq}")
        cur.execute("DELETE FROM gpkg_contents WHERE table_name = ?", (layer,))
        cur.execute(
            "DELETE FROM gpkg_geometry_columns WHERE table_name = ?", (layer,)
        )

        col_defs = ", ".join(
            f"{_quote_ident(c)} {_sql_type([r[i] for r in rows])}"
            for i, c in attrs
        )
        sep = ", " if col_defs else ""
        cur.execute(
            f"CREATE TABLE {lq} (fid INTEGER PRIMARY KEY AUTOINCREMENT, "
            f"geom BLOB{sep}{col_defs})"
        )

        geom_types = set()
        env = [math.inf, math.inf, -math.inf, -math.inf]  # minx,miny,maxx,maxy
        payload = []
        for r in rows:
            wkt = r[gi]
            if wkt is None:
                blob = None
            else:
                blob = gpkg_geometry_blob(wkt, srs_id)
                geom_types.add(parse_wkt(wkt)[0])
                mnx, mxx, mny, mxy = wkt_envelope(wkt)
                env = [min(env[0], mnx), min(env[1], mny),
                       max(env[2], mxx), max(env[3], mxy)]
            payload.append((blob, *[r[i] for i, _ in attrs]))
        marks = ", ".join("?" for _ in range(1 + len(attrs)))
        names = ", ".join(["geom"] + [_quote_ident(c) for _, c in attrs])
        cur.executemany(f"INSERT INTO {lq} ({names}) VALUES ({marks})", payload)

        gtype = geom_types.pop() if len(geom_types) == 1 else "GEOMETRY"
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
            (layer, gtype, srs_id),
        )
        has_env = env[0] <= env[2]
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " min_x, min_y, max_x, max_y, srs_id)"
            " VALUES (?, 'features', ?, ?, ?, ?, ?, ?)",
            (layer, layer,
             env[0] if has_env else None, env[1] if has_env else None,
             env[2] if has_env else None, env[3] if has_env else None,
             srs_id),
        )
        con.commit()
    finally:
        con.close()


def read_gpkg(path: str, layer: str | None = None):
    """``(columns, rows)`` with geometry decoded back to WKT under the
    name ``geometry``. ``layer`` defaults to the only feature layer."""
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        layers = [
            r[0] for r in cur.execute(
                "SELECT table_name FROM gpkg_contents"
                " WHERE data_type = 'features'"
            )
        ]
        if layer is None:
            if len(layers) != 1:
                raise ValueError(f"specify layer; found {layers}")
            layer = layers[0]
        elif layer not in layers:
            raise ValueError(f"layer {layer!r} not in {layers}")
        cur.execute(f"SELECT * FROM {_quote_ident(layer)}")
        cols = [d[0] for d in cur.description]
        g = cols.index("geom")
        out_cols = [
            ("geometry" if i == g else c)
            for i, c in enumerate(cols) if c != "fid"
        ]
        out_rows = []
        for row in cur.fetchall():
            vals = [
                (gpkg_parse_blob(v) if i == g and v is not None else v)
                for i, v in enumerate(row)
                if cols[i] != "fid"
            ]
            out_rows.append(tuple(vals))
        return out_cols, out_rows
    finally:
        con.close()


# ---------------------------------------------------------------------------
# ESRI shapefile (.shp / .shx / .dbf)
# ---------------------------------------------------------------------------

_SHP_NULL, _SHP_POINT, _SHP_POLYLINE, _SHP_POLYGON, _SHP_MULTIPOINT = (
    0, 1, 3, 5, 8,
)

_SHP_TYPE_FOR = {
    "POINT": _SHP_POINT,
    "LINESTRING": _SHP_POLYLINE,
    "MULTILINESTRING": _SHP_POLYLINE,
    "POLYGON": _SHP_POLYGON,
    "MULTIPOLYGON": _SHP_POLYGON,
    "MULTIPOINT": _SHP_MULTIPOINT,
}


def _signed_area(ring) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _close_ring(ring):
    return ring if ring[0] == ring[-1] else ring + [ring[0]]


def _orient(ring, clockwise: bool):
    a = _signed_area(ring)
    # shoelace > 0 = counter-clockwise; shapefile outer rings are clockwise
    if (a > 0) == clockwise:
        return ring[::-1]
    return ring


def _shp_parts(name: str, coords):
    """(shape_type, [part_point_lists]) with shapefile ring orientation:
    outer rings clockwise, holes counter-clockwise."""
    st = _SHP_TYPE_FOR[name]
    if name == "POINT":
        return st, [[coords]]
    if name == "MULTIPOINT":
        return st, [list(coords)]
    if name == "LINESTRING":
        return st, [list(coords)]
    if name == "MULTILINESTRING":
        return st, [list(ls) for ls in coords]
    if name == "POLYGON":
        rings = [_close_ring(list(r)) for r in coords]
        return st, [
            _orient(r, clockwise=(i == 0)) for i, r in enumerate(rings)
        ]
    # MULTIPOLYGON: flatten; first ring of each polygon is the outer ring
    parts = []
    for poly in coords:
        for i, r in enumerate(poly):
            parts.append(_orient(_close_ring(list(r)), clockwise=(i == 0)))
    return st, parts


def _shp_record(name: str, coords) -> bytes:
    st, parts = _shp_parts(name, coords)
    if st == _SHP_POINT:
        (x, y) = parts[0][0]
        return struct.pack("<idd", st, x, y)
    pts = [p for part in parts for p in part]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    bbox = struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    if st == _SHP_MULTIPOINT:
        return (
            struct.pack("<i", st) + bbox + struct.pack("<i", len(pts))
            + b"".join(struct.pack("<dd", x, y) for x, y in pts)
        )
    offsets = []
    off = 0
    for part in parts:
        offsets.append(off)
        off += len(part)
    return (
        struct.pack("<i", st) + bbox
        + struct.pack("<ii", len(parts), len(pts))
        + b"".join(struct.pack("<i", o) for o in offsets)
        + b"".join(struct.pack("<dd", x, y) for x, y in pts)
    )


def _dbf_fields(columns, rows):
    """dBase III field descriptors: ('C', width) for text, ('N', 18, 6)
    for floats, ('N', 18, 0) for ints. Names truncate to 10 chars (the
    format limit the reference warns about, src/exporters.py:105)."""
    fields = []
    for i, c in enumerate(columns):
        vals = [r[i] for r in rows if r[i] is not None]
        if vals and all(isinstance(v, int) and not isinstance(v, bool)
                        for v in vals):
            fields.append((c[:10], "N", 18, 0))
        elif vals and all(isinstance(v, (int, float))
                          and not isinstance(v, bool) for v in vals):
            fields.append((c[:10], "N", 18, 6))
        else:
            width = max([len(str(v)) for v in vals] + [1])
            fields.append((c[:10], "C", min(width, 254), 0))
    return fields


def write_shapefile(path: str, columns: list[str], rows: list[tuple],
                    geometry_col: str = "geometry") -> None:
    """Write ``<path>.shp`` + ``.shx`` + ``.dbf`` (pass ``path`` with or
    without the ``.shp`` suffix). Geometry arrives as WKT; attribute
    names truncate to the format's 10-character limit."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    gi = columns.index(geometry_col)
    attrs = [(i, c) for i, c in enumerate(columns) if i != gi]

    parsed = [
        parse_wkt(r[gi]) if r[gi] is not None else None for r in rows
    ]
    shape_types = {
        _SHP_TYPE_FOR[name] for name, _ in filter(None, parsed)
    }
    if len(shape_types) > 1:
        raise ValueError(
            f"shapefile layers hold one shape type; got {shape_types}"
        )
    shp_type = shape_types.pop() if shape_types else _SHP_NULL

    records = [
        struct.pack("<i", _SHP_NULL) if p is None else _shp_record(*p)
        for p in parsed
    ]
    all_pts = [
        p
        for g in parsed if g is not None
        for p in _all_points(g[0], g[1])
    ]
    if all_pts:
        bbox = (
            min(p[0] for p in all_pts), min(p[1] for p in all_pts),
            max(p[0] for p in all_pts), max(p[1] for p in all_pts),
        )
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    def header(file_len_words: int) -> bytes:
        return (
            struct.pack(">i20xi", 9994, file_len_words)
            + struct.pack("<ii", 1000, shp_type)
            + struct.pack("<4d", *bbox)
            + struct.pack("<4d", 0, 0, 0, 0)  # z/m ranges unused (2-D)
        )

    shp_body = b""
    shx_body = b""
    offset_words = 50  # header is 100 bytes = 50 words
    for n, rec in enumerate(records, start=1):
        content_words = len(rec) // 2
        shp_body += struct.pack(">ii", n, content_words) + rec
        shx_body += struct.pack(">ii", offset_words, content_words)
        offset_words += 4 + content_words

    with open(base + ".shp", "wb") as f:
        f.write(header(50 + len(shp_body) // 2) + shp_body)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + len(shx_body) // 2) + shx_body)

    attr_cols = [c for _, c in attrs]
    attr_rows = [tuple(r[i] for i, _ in attrs) for r in rows]
    fields = _dbf_fields(attr_cols, attr_rows)
    rec_size = 1 + sum(w for _, _, w, _ in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack("<B3BIHH20x", 0x03, 126, 1, 1, len(rows),
                       hdr_size, rec_size)
    for fname, ftype, width, dec in fields:
        dbf += struct.pack(
            "<11sc4xBB14x", fname.encode("ascii", "replace"),
            ftype.encode(), width, dec,
        )
    dbf += b"\x0d"
    for r in attr_rows:
        dbf += b" "
        for v, (_, ftype, width, dec) in zip(r, fields):
            if ftype == "N":
                text = (
                    " " * width if v is None
                    else (f"{v:{width}.{dec}f}" if dec else f"{v:{width}d}")
                )
                if len(text) > width:
                    raise ValueError(f"numeric {v!r} overflows width {width}")
                dbf += text.encode("ascii")
            else:
                text = "" if v is None else str(v)
                enc = text.encode("utf-8", "replace")[:width]
                dbf += enc.ljust(width)
    dbf += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(dbf))


def _split_polygon_parts(parts):
    """Regroup flat shapefile polygon parts into polygons: a clockwise
    ring (negative shoelace) starts a new polygon; counter-clockwise
    rings are holes of the preceding outer ring."""
    polys = []
    for ring in parts:
        if _signed_area(ring) < 0 or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    return polys


def read_shapefile(path: str):
    """``(columns, rows)`` with geometry re-encoded as WKT under
    ``geometry``. Polygon records with one outer ring return POLYGON;
    multiple outer rings return MULTIPOLYGON (mirroring the writer)."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    with open(base + ".shp", "rb") as f:
        shp = f.read()
    geoms = []
    pos = 100
    while pos < len(shp):
        (_, content_words) = struct.unpack_from(">ii", shp, pos)
        pos += 8
        rec = shp[pos:pos + 2 * content_words]
        pos += 2 * content_words
        (st,) = struct.unpack_from("<i", rec, 0)
        if st == _SHP_NULL:
            geoms.append(None)
        elif st == _SHP_POINT:
            x, y = struct.unpack_from("<dd", rec, 4)
            geoms.append(unparse_wkt("POINT", (x, y)))
        elif st == _SHP_MULTIPOINT:
            (n,) = struct.unpack_from("<i", rec, 36)
            flat = struct.unpack_from(f"<{2 * n}d", rec, 40)
            pts = [(flat[i], flat[i + 1]) for i in range(0, 2 * n, 2)]
            geoms.append(unparse_wkt("MULTIPOINT", pts))
        else:
            n_parts, n_pts = struct.unpack_from("<ii", rec, 36)
            offs = list(struct.unpack_from(f"<{n_parts}i", rec, 44))
            flat = struct.unpack_from(f"<{2 * n_pts}d", rec, 44 + 4 * n_parts)
            pts = [(flat[i], flat[i + 1]) for i in range(0, 2 * n_pts, 2)]
            parts = [
                pts[offs[i]:(offs[i + 1] if i + 1 < n_parts else n_pts)]
                for i in range(n_parts)
            ]
            if st == _SHP_POLYLINE:
                geoms.append(
                    unparse_wkt("LINESTRING", parts[0]) if n_parts == 1
                    else unparse_wkt("MULTILINESTRING", parts)
                )
            else:
                polys = _split_polygon_parts(parts)
                geoms.append(
                    unparse_wkt("POLYGON", polys[0]) if len(polys) == 1
                    else unparse_wkt("MULTIPOLYGON", polys)
                )

    with open(base + ".dbf", "rb") as f:
        dbf = f.read()
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", dbf, 4)
    fields = []
    fpos = 32
    while dbf[fpos] != 0x0D:
        fname = dbf[fpos:fpos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(dbf[fpos + 11])
        width = dbf[fpos + 16]
        dec = dbf[fpos + 17]
        fields.append((fname, ftype, width, dec))
        fpos += 32
    rows = []
    rpos = hdr_size
    for i in range(n_rec):
        rec = dbf[rpos:rpos + rec_size]
        rpos += rec_size
        vals = []
        cpos = 1
        for fname, ftype, width, dec in fields:
            raw = rec[cpos:cpos + width]
            cpos += width
            if ftype == "N":
                text = raw.decode("ascii").strip()
                if not text:
                    vals.append(None)
                elif dec:
                    vals.append(float(text))
                else:
                    vals.append(int(text))
            else:
                vals.append(raw.decode("utf-8", "replace").rstrip())
        rows.append(tuple([geoms[i]] + vals))
    return ["geometry"] + [f[0] for f in fields], rows

"""WKT coordinate algebra and grid-partitioned bbox spatial join.

The reference carries geometry opaquely and only ever equi-joins on GEOID
(reference: src/census_pipeline.py:270-272); this module is the extension
tier's first *real* spatial predicate, built from pure Catalyst expressions
over WKT strings (the vanilla-Spark geometry representation per SURVEY.md
§1.1 — a Sedona upgrade would swap these for ST_* calls with the same
shapes):

- ``wkt_xs`` / ``wkt_ys`` / ``wkt_bbox`` — extract every coordinate pair
  from ANY WKT (POINT / LINESTRING / POLYGON) with ``regexp_extract_all``
  and fold min/max — no UDF, codegen-fused into the scan.
- ``bbox_intersects`` / ``bbox_contains_point`` — interval algebra on the
  extracted envelopes.
- ``grid_bbox_point_join`` — the 100 TB join shape: both sides are mapped
  onto a fixed grid (a point lands in exactly one cell; a bbox explodes
  into every cell it covers), candidates come from a hash equi-join on
  (cell_x, cell_y), and the exact envelope predicate verifies. No cross
  join, no per-partition nested loop; cell size trades explode volume
  against candidate selectivity (pick ≈ the median bbox edge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COORD_PAIR = r"(-?[0-9]+(?:\.[0-9]+)?) (-?[0-9]+(?:\.[0-9]+)?)"


def wkt_coord_pairs(geom: Column | str) -> Column:
    """All ``"x y"`` coordinate pair substrings of a WKT string, in
    geometry order (array<string>)."""
    g = F.col(geom) if isinstance(geom, str) else geom
    return F.regexp_extract_all(g, F.lit(_COORD_PAIR), 0)


def _pair_part(idx: int):
    return lambda p: F.split(p, " ")[idx].cast("double")


def wkt_xs(geom: Column | str) -> Column:
    return F.transform(wkt_coord_pairs(geom), _pair_part(0))


def wkt_ys(geom: Column | str) -> Column:
    return F.transform(wkt_coord_pairs(geom), _pair_part(1))


def wkt_bbox(geom: Column | str) -> Column:
    """Envelope of any WKT geometry:
    struct(xmin, ymin, xmax, ymax) — min/max folds over the coordinate
    arrays."""
    xs, ys = wkt_xs(geom), wkt_ys(geom)
    return F.struct(
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    )


def bbox_intersects(a: Column, b: Column) -> Column:
    """Envelope overlap (closed intervals): the standard separating-axis
    test on both axes."""
    return (
        (a["xmin"] <= b["xmax"]) & (b["xmin"] <= a["xmax"])
        & (a["ymin"] <= b["ymax"]) & (b["ymin"] <= a["ymax"])
    )


def bbox_contains_point(bbox: Column, x: Column, y: Column) -> Column:
    return (
        (x >= bbox["xmin"]) & (x <= bbox["xmax"])
        & (y >= bbox["ymin"]) & (y <= bbox["ymax"])
    )


def point_in_polygon(
    xs: Column, ys: Column, px: Column, py: Column
) -> Column:
    """Ray-casting point-in-polygon over vertex coordinate arrays (a
    closed WKT ring: first vertex repeated last). Counts edges whose
    half-open y-interval brackets ``py`` and whose x-intersection lies
    right of the point; odd count ⇒ inside. Pure Catalyst (``filter`` over
    an edge-index ``sequence``) — per-row cost ∝ vertex count, no UDF.
    Boundary points are half-open-rule dependent; callers needing closed
    semantics should test edges explicitly."""
    n = F.size(xs)
    edges = F.sequence(F.lit(1), n - 1)  # 1-based first index of each edge

    def crosses(i: Column) -> Column:
        yi, yj = F.element_at(ys, i), F.element_at(ys, i + 1)
        xi, xj = F.element_at(xs, i), F.element_at(xs, i + 1)
        return ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi) / (yj - yi) + xi
        )

    return F.size(F.filter(edges, crosses)) % 2 == 1


def _shoelace_terms(xs: Column, ys: Column) -> Column:
    edges = F.sequence(F.lit(1), F.size(xs) - 1)
    return F.aggregate(
        edges,
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at(xs, i) * F.element_at(ys, i + 1)
            - F.element_at(xs, i + 1) * F.element_at(ys, i)
        ),
    )


def polygon_area(xs: Column, ys: Column) -> Column:
    """Unsigned shoelace area of a closed ring (vertex arrays)."""
    return F.abs(_shoelace_terms(xs, ys)) / 2


def polygon_centroid(xs: Column, ys: Column) -> Column:
    """Centroid struct(cx, cy) of a closed ring via the standard signed
    shoelace moments — sign cancels in the ratio, so ring orientation
    doesn't matter."""
    signed2 = _shoelace_terms(xs, ys)  # 2 × signed area
    edges = F.sequence(F.lit(1), F.size(xs) - 1)

    def moment(coord: Column):
        return F.aggregate(
            edges,
            F.lit(0.0),
            lambda acc, i: acc
            + (F.element_at(coord, i) + F.element_at(coord, i + 1))
            * (
                F.element_at(xs, i) * F.element_at(ys, i + 1)
                - F.element_at(xs, i + 1) * F.element_at(ys, i)
            ),
        )

    return F.struct(
        (moment(xs) / (3 * signed2)).alias("cx"),
        (moment(ys) / (3 * signed2)).alias("cy"),
    )


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine, mean Earth radius
    6371.0088). Pure trig expressions — identical formula is expressible
    in DuckDB for oracle parity; round outputs at ≤4 dp because libm
    sin/cos may differ in the last ulp across engines."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = F.sin(dphi) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dlmb) ** 2
    return 2 * 6371.0088 * F.asin(F.sqrt(a))


def _cell(v: Column, cell_size: float) -> Column:
    return F.floor(v / F.lit(float(cell_size))).cast("long")


# Sentinel for null grid keys (see _grid_key): a cell index no real
# coordinate reaches (|coord| would need to exceed ~4.6e18 * cell_size).
_NULL_CELL = -(2**62)


def _grid_key(c: Column) -> Column:
    """Grid join keys must be PROVABLY non-null: an equi-join infers
    ``isnotnull(key)`` on nullable keys, and constraint pushdown rewrites
    that check through every projection down to the file scan — re-deriving
    the whole WKT-parse + cell expression per input row BELOW the
    repartition exchange (measured: the overlay join serialized ~2 s of
    parse work into one task). ``coalesce`` folds the inferred check away;
    sentinel rows (degenerate/null geometry) pair only with other sentinel
    rows and are then dropped by the exact verify predicate, which is
    null-rejecting."""
    return F.coalesce(c, F.lit(_NULL_CELL))


def grid_bbox_point_join(
    points: DataFrame,
    boxes: DataFrame,
    cell_size: float,
    x_col: str = "px",
    y_col: str = "py",
    bbox_col: str = "bbox",
    broadcast_boxes: bool = True,
) -> DataFrame:
    """Spatial candidate join: every ``points`` row against every
    ``boxes`` row whose envelope contains it.

    Grid partitioning keeps this an equi-join: a point hashes to exactly
    one (cell_x, cell_y); a bbox explodes into each grid cell its envelope
    covers (``sequence`` × ``sequence`` flatten — bounded by
    (edge/cell_size)² rows per box). Each (box, point) meets in at most
    one cell (the point's), so no post-join dedup is needed; the exact
    ``bbox_contains_point`` predicate verifies candidates. With
    ``broadcast_boxes`` (dimension-sized polygon sets — the census case:
    ~10⁵ boundaries vs 10¹⁰ points) the points side never shuffles at all.
    """
    # explode_outer + coalesce'd keys: a plain explode makes the optimizer
    # infer `size(__cells) > 0` (InferFiltersFromGenerate) and push the
    # whole cell-derivation expression down to the scan as a filter —
    # below any repartition, serializing the parse onto the scan's task
    # count (see _grid_key). Outer explode infers nothing; null-cell rows
    # carry the sentinel key and die in the exact verify.
    b = boxes.withColumn(
        "__cells",
        F.flatten(
            F.transform(
                F.sequence(
                    _cell(F.col(bbox_col)["xmin"], cell_size),
                    _cell(F.col(bbox_col)["xmax"], cell_size),
                ),
                lambda cx: F.transform(
                    F.sequence(
                        _cell(F.col(bbox_col)["ymin"], cell_size),
                        _cell(F.col(bbox_col)["ymax"], cell_size),
                    ),
                    lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
                ),
            )
        ),
    ).select("*", F.explode_outer("__cells").alias("__c")).select(
        *[c for c in boxes.columns],
        _grid_key(F.col("__c.cx")).alias("__cx"),
        _grid_key(F.col("__c.cy")).alias("__cy"),
    )
    p = points.withColumn(
        "__cx", _grid_key(_cell(F.col(x_col), cell_size))
    ).withColumn("__cy", _grid_key(_cell(F.col(y_col), cell_size)))
    bside = F.broadcast(b) if broadcast_boxes else b
    return (
        p.join(bside, on=["__cx", "__cy"])
        .filter(bbox_contains_point(F.col(bbox_col), F.col(x_col), F.col(y_col)))
        .drop("__cx", "__cy")
    )


def grid_bbox_bbox_join(
    left: DataFrame,
    right: DataFrame,
    cell_size: float,
    left_bbox: str = "bbox_a",
    right_bbox: str = "bbox_b",
    broadcast_right: bool = True,
) -> DataFrame:
    """Polygon-polygon candidate join: every ``left`` row against every
    ``right`` row whose envelope intersects it — the prefilter stage of
    overlay (VERDICT r3 #7).

    Both sides explode into the grid cells their envelope covers and meet
    in a hash equi-join on (cell_x, cell_y). An intersecting pair shares
    EVERY cell covered by the envelope intersection, so duplicates are
    removed without a shuffle by the reference-point technique: a pair is
    kept only in the one canonical cell containing the intersection's
    (xmin, ymin) corner — which both envelopes cover by construction. The
    exact ``bbox_intersects`` predicate verifies candidates. Column names
    must be disjoint across the two frames (alias before calling)."""

    def explode_cells(df: DataFrame, bbox: str) -> DataFrame:
        # explode_outer + sentinel keys — see grid_bbox_point_join; a
        # plain explode's inferred non-empty filter re-derives the parse
        # expression at the scan, below any repartition
        return df.withColumn(
            "__cells",
            F.flatten(
                F.transform(
                    F.sequence(
                        _cell(F.col(bbox)["xmin"], cell_size),
                        _cell(F.col(bbox)["xmax"], cell_size),
                    ),
                    lambda cx: F.transform(
                        F.sequence(
                            _cell(F.col(bbox)["ymin"], cell_size),
                            _cell(F.col(bbox)["ymax"], cell_size),
                        ),
                        lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
                    ),
                )
            ),
        ).select("*", F.explode_outer("__cells").alias("__c")).select(
            *[c for c in df.columns],
            _grid_key(F.col("__c.cx")).alias("__cx"),
            _grid_key(F.col("__c.cy")).alias("__cy"),
        )

    el = explode_cells(left, left_bbox)
    er = explode_cells(right, right_bbox)
    rside = F.broadcast(er) if broadcast_right else er
    a, b = F.col(left_bbox), F.col(right_bbox)
    canonical = (
        (F.col("__cx") == _cell(F.greatest(a["xmin"], b["xmin"]), cell_size))
        & (F.col("__cy") == _cell(F.greatest(a["ymin"], b["ymin"]), cell_size))
    )
    return (
        el.join(rside, on=["__cx", "__cy"])
        .filter(bbox_intersects(a, b) & canonical)
        .drop("__cx", "__cy")
    )


def ring_points(xs: Column, ys: Column) -> Column:
    """A closed WKT ring (first vertex repeated last) as an OPEN
    ``array<struct<x,y>>`` (repetition dropped) — the vertex-list form
    the clipping fold operates on."""
    idx = F.sequence(F.lit(1), F.size(xs) - 1)
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(xs, i).alias("x"), F.element_at(ys, i).alias("y")
        ),
    )


def clip_convex(
    sub_xs: Column, sub_ys: Column, clip_xs: Column, clip_ys: Column
) -> Column:
    """Sutherland–Hodgman polygon clipping as a pure Catalyst fold — no
    UDF, same style as the ray-cast. Clips the subject ring by each edge
    of a CONVEX clip ring; when the subject is also convex the result is
    their exact intersection. Returns the clipped polygon as an open
    ``array<struct<x,y>>`` (empty when disjoint).

    Shape: ``aggregate`` over the clip edges with the running vertex list
    as the accumulator; each step rebuilds the list with one
    ``flatten(transform(...))`` pass over the current edges (0-2 output
    points per edge, per the classic case table). Per-row cost
    ∝ |subject| × |clip| — narrow, codegen-fused, scale-free.
    Orientation-insensitive: the inside test is signed by the clip ring's
    shoelace orientation.

    All four inputs are let-bound through a single-element ``transform``
    lambda so that computed input expressions (e.g. ``wkt_xs`` regex
    trees) are evaluated once per row, not once per ``element_at``
    reference inside the folds (see ``polygon_area_points``)."""

    def body(t: Column) -> Column:
        sxs, sys_ = t["sx"], t["sy"]
        cxs, cys = t["cx"], t["cy"]
        orient = F.signum(_shoelace_terms(cxs, cys))
        subject = ring_points(sxs, sys_)
        clip_edges = F.transform(
            F.sequence(F.lit(1), F.size(cxs) - 1),
            lambda i: F.struct(
                F.element_at(cxs, i).alias("ax"),
                F.element_at(cys, i).alias("ay"),
                F.element_at(cxs, i + 1).alias("bx"),
                F.element_at(cys, i + 1).alias("by"),
            ),
        )

        def clip_one(acc: Column, e: Column) -> Column:
            m = F.size(acc)

            def side(p: Column) -> Column:
                # signed distance proxy: orient × cross(edge, p - start)
                return orient * (
                    (e["bx"] - e["ax"]) * (p["y"] - e["ay"])
                    - (e["by"] - e["ay"]) * (p["x"] - e["ax"])
                )

            def step(j: Column) -> Column:
                s = F.element_at(acc, j)
                t2 = F.element_at(acc, (j % m) + 1)
                ds, dt = side(s), side(t2)
                # ds/(ds-dt) only evaluated on sign-crossing branches,
                # where ds - dt is strictly nonzero
                frac = ds / (ds - dt)
                ipt = F.struct(
                    (s["x"] + frac * (t2["x"] - s["x"])).alias("x"),
                    (s["y"] + frac * (t2["y"] - s["y"])).alias("y"),
                )
                return (
                    F.when(
                        dt >= 0,
                        F.when(ds < 0, F.array(ipt, t2)).otherwise(F.array(t2)),
                    )
                    .otherwise(
                        F.when(ds >= 0, F.array(ipt)).otherwise(F.slice(acc, 1, 0))
                    )
                )

            return F.when(m == F.lit(0), acc).otherwise(
                F.flatten(F.transform(F.sequence(F.lit(1), m), step))
            )

        return F.aggregate(clip_edges, subject, clip_one)

    bound = F.struct(
        sub_xs.alias("sx"), sub_ys.alias("sy"),
        clip_xs.alias("cx"), clip_ys.alias("cy"),
    )
    return F.element_at(F.transform(F.array(bound), body), 1)


def polygon_area_points(ring: Column) -> Column:
    """Unsigned shoelace area over an OPEN ``array<struct<x,y>>`` ring
    (wrap-around edge included); degenerate rings (< 3 vertices) have
    area 0.

    The input is let-bound through a single-element ``transform`` lambda
    before the fold. Without this, passing a computed expression (e.g.
    the ``clip_convex`` tree) would re-evaluate it at EVERY ``element_at``
    reference inside the fold — measured 12× per row on the overlay
    query (62 s → 5 s at sf0.1). A lambda variable is evaluated once per
    row; Catalyst has no cross-HOF common-subexpression elimination to do
    this for us."""

    def shoelace(r: Column) -> Column:
        m = F.size(r)
        terms = F.aggregate(
            F.sequence(F.lit(1), m),
            F.lit(0.0),
            lambda acc, j: acc
            + (
                F.element_at(r, j)["x"] * F.element_at(r, (j % m) + 1)["y"]
                - F.element_at(r, (j % m) + 1)["x"] * F.element_at(r, j)["y"]
            ),
        )
        return F.when(m < 3, F.lit(0.0)).otherwise(F.abs(terms) / 2)

    return F.element_at(F.transform(F.array(ring), shoelace), 1)


def radius_point_join(
    points: DataFrame,
    centers: DataFrame,
    radius: float,
    x_col: str = "px",
    y_col: str = "py",
    cx_col: str = "cx",
    cy_col: str = "cy",
    cell_size: float | None = None,
    broadcast_centers: bool = True,
) -> DataFrame:
    """Planar within-radius join: every point paired with every center at
    Euclidean distance <= radius. The candidate stage is the grid-cell
    equi-join over each center's radius bbox (cell_size defaults to the
    radius — each center covers <= 9 cells); the exact verify compares
    SQUARED distances so no sqrt sits on the predicate boundary. Adds a
    ``dist`` column (rounded 6 dp). The haversine variant swaps the
    verify predicate; the candidate grid works unchanged on small
    radii."""
    r = float(radius)
    boxed = centers.withColumn(
        "__rbox",
        F.struct(
            (F.col(cx_col) - r).alias("xmin"),
            (F.col(cy_col) - r).alias("ymin"),
            (F.col(cx_col) + r).alias("xmax"),
            (F.col(cy_col) + r).alias("ymax"),
        ),
    )
    cand = grid_bbox_point_join(
        points, boxed, cell_size or r, x_col=x_col, y_col=y_col,
        bbox_col="__rbox", broadcast_boxes=broadcast_centers,
    ).drop("__rbox")
    d2 = (F.col(x_col) - F.col(cx_col)) ** 2 + (F.col(y_col) - F.col(cy_col)) ** 2
    return (
        cand.filter(d2 <= F.lit(r * r))
        .withColumn("dist", F.round(F.sqrt(d2), 6))
    )


def nearest_site_join(
    points: DataFrame,
    sites: DataFrame,
    point_id: str = "id",
    site_id: str = "site_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Nearest-site assignment — the reverse-geocoding / service-area
    join: each point gets its closest site by great-circle distance
    (store locator, facility catchment, nearest-boundary-centroid
    labeling). Output: (point id, site id, dist_km).

    The site frame is BROADCAST (gazetteers/facility lists are
    dimension-sized) and the argmin is a min-struct over (rounded
    distance, site id) — one narrow crossJoin row per (point, site), no
    window, no point-side shuffle. Distance is rounded to 4 dp BEFORE
    the argmin with ties to the smallest site id, so the winner is
    identical in any engine despite last-ulp libm trig differences (the
    `haversine_km` discipline). For site sets beyond broadcast size,
    ``nearest_site_join_grid`` applies the same argmin over grid-ring
    candidate sets — output-identical (equivalence-tested), no
    broadcast, no crossJoin."""
    p = points.select(
        F.col(point_id).alias("__pid"),
        F.col(lat_col).cast("double").alias("__plat"),
        F.col(lon_col).cast("double").alias("__plon"),
    )
    s = sites.select(
        F.col(site_id).alias("__sid"),
        F.col(lat_col).cast("double").alias("__slat"),
        F.col(lon_col).cast("double").alias("__slon"),
    )
    d = F.round(
        haversine_km(F.col("__plat"), F.col("__plon"),
                     F.col("__slat"), F.col("__slon")),
        4,
    )
    return (
        p.crossJoin(F.broadcast(s))
        .select("__pid", "__sid", d.alias("__d"))
        .groupBy("__pid")
        .agg(F.min(F.struct("__d", "__sid")).alias("__m"))
        .select(
            F.col("__pid").alias(point_id),
            F.col("__m.__sid").alias(site_id),
            F.col("__m.__d").alias("dist_km"),
        )
    )


def nearest_site_join_grid(
    points: DataFrame,
    sites: DataFrame,
    point_id: str = "id",
    site_id: str = "site_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 15.0,
    max_rounds: int = 12,
) -> DataFrame:
    """``nearest_site_join`` for site sets BEYOND broadcast size
    (VERDICT r5 #4) — output-identical to the broadcast form (same
    rounded-argmin tail, same (dist, site id) tie rule; equivalence-
    tested in tests/test_geo.py) but the sites frame never broadcasts
    and nothing crossJoins.

    Shape: both sides map onto a lat/lon grid (``cell_deg`` per cell,
    longitude cells CYCLIC mod ceil(360/cell_deg) so the antimeridian
    seam joins its true neighbors). Each round r (doubling 1, 2, 4, …)
    the still-unresolved points explode to the (2r+1)² cell disc around
    their own cell and equi-join sites on the cell key — a plain
    shuffle hash join, candidate volume bounded by disc area × site
    density. A point accepts its candidate argmin only when it is
    CERTIFIED: the best rounded distance must undercut the provable
    minimum distance to any site outside the explored disc,

      lb_lat = R · radians(r · g)                 (site ≥ r·g away in lat)
      lb_lon = 2R · asin(√(cos φp · cos φ̄s) · sin(radians(min(r·g, 180))/2))
               with φ̄s = min(90°, |φp| + (r+1)·g)  (site ≥ r·g away in lon)
      certified  ⇔  best_d + 1e-3 < min(lb_lat, lb_lon)

    (the 1e-3 km slack dominates the 4-dp rounding, so an outside site
    can never tie or beat an accepted winner). Near the poles lb_lon
    degrades exactly as geometry demands (meridians converge) and the
    round doubling widens the disc until the longitude ring closes on
    itself; once r·g ≥ 180 and 2r+1 ≥ n_lon the disc is the whole
    globe, so termination is certain with every point resolved —
    max_rounds is an assertion, not a correctness knob.

    Driver loop state: one isEmpty() probe per round over the shrinking
    unresolved frame (localCheckpoint cuts the growing lineage), ≤
    log₂(180/g) + 1 rounds total. No collect of data rows."""
    import math

    g = float(cell_deg)
    if g <= 0 or g > 180:
        raise ValueError("cell_deg must be in (0, 180]")
    n_lon = int(math.ceil(360.0 / g))
    n_lat = int(math.ceil(180.0 / g))
    earth_r = 6371.0088

    p = points.select(
        F.col(point_id).alias("__pid"),
        F.col(lat_col).cast("double").alias("__plat"),
        F.col(lon_col).cast("double").alias("__plon"),
    ).withColumn(
        "__clat", F.least(F.lit(n_lat - 1), _cell(F.col("__plat") + 90.0, g))
    ).withColumn(
        "__clon", F.pmod(_cell(F.col("__plon") + 180.0, g), F.lit(n_lon))
    )
    s = sites.select(
        F.col(site_id).alias("__sid"),
        F.col(lat_col).cast("double").alias("__slat"),
        F.col(lon_col).cast("double").alias("__slon"),
    ).withColumn(
        "__klat", F.least(F.lit(n_lat - 1), _cell(F.col("__slat") + 90.0, g))
    ).withColumn(
        "__klon", F.pmod(_cell(F.col("__slon") + 180.0, g), F.lit(n_lon))
    )

    d = F.round(
        haversine_km(F.col("__plat"), F.col("__plon"),
                     F.col("__slat"), F.col("__slon")),
        4,
    )
    out_schema = None
    resolved_parts: list[DataFrame] = []
    unresolved = p
    r = 1
    for _ in range(max_rounds):
        covers_all = (r * g >= 180.0) and (2 * r + 1 >= n_lon)
        disc = (
            unresolved
            .withColumn("__dl", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .withColumn("__klat", F.col("__clat") + F.col("__dl"))
            .filter(F.col("__klat").between(0, n_lat - 1))
            .withColumn("__dm", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .withColumn(
                "__klon", F.pmod(F.col("__clon") + F.col("__dm"), F.lit(n_lon))
            )
            .drop("__dl", "__dm")
        )
        # duplicate (point, site) pairs from a wrapped lon ring are
        # harmless under the min-struct argmin
        best = (
            disc.join(s, on=["__klat", "__klon"])
            .select(
                "__pid", "__plat", "__plon", "__clat", "__clon",
                F.struct(d.alias("__d"), F.col("__sid").alias("__sid"))
                .alias("__c"),
            )
            .groupBy("__pid", "__plat", "__plon", "__clat", "__clon")
            .agg(F.min("__c").alias("__m"))
        )
        if covers_all:
            certified = F.lit(True)
        else:
            lb_lat = F.lit(earth_r * math.radians(r * g))
            phi_s = F.least(
                F.lit(90.0), F.abs(F.col("__plat")) + (r + 1) * g
            )
            lb_lon = (
                2.0
                * earth_r
                * F.asin(
                    F.sqrt(
                        F.greatest(
                            F.lit(0.0),
                            F.cos(F.radians(F.col("__plat")))
                            * F.cos(F.radians(phi_s)),
                        )
                    )
                    * math.sin(math.radians(min(r * g, 180.0)) / 2.0)
                )
            )
            certified = F.col("__m.__d") + 1e-3 < F.least(lb_lat, lb_lon)
        done = best.filter(certified).select(
            F.col("__pid").alias(point_id),
            F.col("__m.__sid").alias(site_id),
            F.col("__m.__d").alias("dist_km"),
        )
        out_schema = done.schema
        resolved_parts.append(done)
        if covers_all:
            unresolved = None
            break
        unresolved = unresolved.join(
            best.filter(certified).select("__pid"), on="__pid", how="left_anti"
        ).localCheckpoint(eager=True)
        if unresolved.isEmpty():
            unresolved = None
            break
        r *= 2
    if unresolved is not None:
        raise AssertionError(
            "nearest_site_join_grid failed to converge — max_rounds too "
            "small for cell_deg (needs ~log2(180/cell_deg) + 1 rounds)"
        )
    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return out


def dbscan_grid(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    collapse_duplicates: bool = True,
) -> DataFrame:
    """Density-based spatial clustering (DBSCAN, Ester et al. KDD'96)
    as a distributed dataflow — the grid-partitioned formulation every
    MapReduce-DBSCAN paper reduces to: candidate neighbor pairs come
    from a hash equi-join on eps-sized grid cells (a point's disc can
    only reach the 3×3 cell block around it, so the join is EXACT, not
    approximate), never a cross join.

    Planar Euclidean semantics on (x, y); the eps test compares SQUARED
    distance to eps² (no sqrt — exact arithmetic in both engines).
    Standard DBSCAN roles with deterministic tie-breaks:

    - core: |N_eps(p)| ≥ min_pts, the neighborhood INCLUDING p itself;
    - cluster: connected components over core-core eps-pairs
      (functions/dedup.dup_clusters star form — O(log² n) rounds),
      labeled by the minimum member id; a core with no core neighbor is
      its own singleton cluster;
    - border: non-core within eps of ≥1 core — assigned the MINIMUM
      cluster id among its core neighbors (the deterministic resolution
      of DBSCAN's classic border ambiguity);
    - noise: everything else (cluster is NULL).

    Returns (id, role 'core'|'border'|'noise', cluster).

    ``collapse_duplicates`` (default, VERDICT r8 #5) pre-collapses
    coincident (x, y) points into WEIGHTED locations (weight = count,
    representative = min id) before the 3×3 join, and fans roles back
    out per id at the end. Output-identical to the point-level path
    (coincident points share a neighborhood, hence a role; coincident
    cores are all eps-pairs of each other, so they land in one CC
    labeled by their min id — exactly the collapsed location's rep),
    but the candidate-pair count runs over DISTINCT locations: a
    million exact-duplicate points are ONE weighted row, so the
    coincident-point mega-cell that is quadratic in the point-level
    formulation is O(1) here. Pass ``False`` to keep the point-level
    frame (the identity is unit-tested against it).

    Scale shape: the 3×3 explode is map-side (×9 narrow rows); the
    candidate join hashes on cell ids, so work concentrates where
    density does — the pair count is Σ_cell |cell|·|3×3 block| over
    distinct LOCATIONS, the quantity every distributed DBSCAN bounds.
    Neighborhood mass is one partial-aggregated weighted groupBy; the
    CC runs on the (small) core-core location edge set; border
    assignment is one more aggregate over the already-computed pair
    frame; the fan-out is a co-located (x, y) equi-join."""
    if eps <= 0:
        raise ValueError("eps must be > 0")
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    from census_data_pipeline_spark.functions.dedup import dup_clusters
    from census_data_pipeline_spark.sources.catalog import (
        ensure_parallelism,
    )

    p = ensure_parallelism(points).select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).localCheckpoint(eager=False)

    # location frame: one row per distinct (x, y) when collapsing
    # (rep = min id, w = multiplicity), else one row per point (w = 1).
    # Both paths run the SAME weighted dataflow below; the unweighted
    # original is the w ≡ 1 special case.
    if collapse_duplicates:
        locs = p.groupBy("x", "y").agg(
            F.min("id").alias("rep"), F.count("*").alias("w")
        )
    else:
        locs = p.select(
            F.col("id").alias("rep"), "x", "y", F.lit(1).alias("w")
        )
    locs = locs.select(
        "*",
        F.floor(F.col("x") / F.lit(float(eps))).cast("long").alias("cx"),
        F.floor(F.col("y") / F.lit(float(eps))).cast("long").alias("cy"),
    ).localCheckpoint(eager=False)

    offs = F.expr("explode(array(-1, 0, 1))")
    a = (
        locs.select(
            F.col("rep").alias("__ar"), F.col("x").alias("__ax"),
            F.col("y").alias("__ay"), "cx", "cy",
        )
        .withColumn("__dx", offs)
        .withColumn("__dy", offs)
        .select(
            "__ar", "__ax", "__ay",
            (F.col("cx") + F.col("__dx")).alias("__jx"),
            (F.col("cy") + F.col("__dy")).alias("__jy"),
        )
    )
    b = locs.select(
        F.col("rep").alias("__br"), F.col("x").alias("__bx"),
        F.col("y").alias("__by"), F.col("w").alias("__bw"),
        F.col("cx").alias("__jx"), F.col("cy").alias("__jy"),
    )
    e2 = F.lit(float(eps) * float(eps))
    # self-pair (dx = dy = 0) kept: the weight sum is then the
    # SELF-INCLUSIVE |N_eps| mass, replacing the old count + 1
    nb = (
        a.join(b, ["__jx", "__jy"])
        .filter(
            (F.col("__ax") - F.col("__bx")) * (F.col("__ax") - F.col("__bx"))
            + (F.col("__ay") - F.col("__by"))
            * (F.col("__ay") - F.col("__by"))
            <= e2
        )
        .select(
            F.col("__ar").alias("rep"), F.col("__br").alias("nb"),
            F.col("__bw").alias("nw"),
        )
        .localCheckpoint(eager=False)
    )
    ncnt = nb.groupBy("rep").agg(F.sum("nw").alias("__n"))
    cores = (
        ncnt.filter(F.col("__n") >= min_pts).select("rep")
        .localCheckpoint(eager=False)
    )
    core_pairs = (
        nb.join(cores.withColumnRenamed("rep", "__ca"),
                nb["rep"] == F.col("__ca"))
        .join(cores.withColumnRenamed("rep", "__cb"),
              nb["nb"] == F.col("__cb"))
        .filter(F.col("rep") < F.col("nb"))
        .select(F.col("rep").alias("id_a"), F.col("nb").alias("id_b"))
    )
    labeled = dup_clusters(core_pairs, algorithm="star").select(
        F.col("doc_id").alias("rep"), F.col("cluster_id").alias("cluster")
    )
    core_clusters = labeled.unionByName(
        cores.join(labeled.select("rep"), "rep", "left_anti").select(
            "rep", F.col("rep").alias("cluster")
        )
    ).localCheckpoint(eager=False)

    border = (
        nb.join(cores.withColumnRenamed("rep", "__ci"),
                nb["nb"] == F.col("__ci"))
        .join(core_clusters.withColumnsRenamed(
            {"rep": "__cj", "cluster": "__cl"}), F.col("nb") == F.col("__cj"))
        .join(cores.withColumnRenamed("rep", "__self"),
              nb["rep"] == F.col("__self"), "left_anti")
        .groupBy("rep")
        .agg(F.min("__cl").alias("cluster"))
    )
    loc_roles = (
        core_clusters.select(
            "rep", F.lit("core").alias("role"),
            F.col("cluster").cast("long"),
        )
        .unionByName(border.select(
            "rep", F.lit("border").alias("role"),
            F.col("cluster").cast("long"),
        ))
        .unionByName(
            locs.select("rep")
            .join(core_clusters.select("rep"), "rep", "left_anti")
            .join(border.select("rep"), "rep", "left_anti")
            .select(
                "rep", F.lit("noise").alias("role"),
                F.lit(None).cast("long").alias("cluster"),
            )
        )
    )
    if not collapse_duplicates:
        return loc_roles.select(
            F.col("rep").alias("id"), "role", "cluster"
        )
    # fan the location role back out to every coincident point id
    return (
        p.join(
            locs.select("x", "y", "rep").join(loc_roles, "rep").drop("rep"),
            ["x", "y"],
        )
        .select("id", "role", "cluster")
    )

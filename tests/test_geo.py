"""WKT coordinate algebra + grid-partitioned bbox join (operators/geo.py)."""

import random

from pyspark.sql import functions as F

from census_data_pipeline_spark.operators import geo


def test_wkt_bbox_point_linestring_polygon(spark):
    rows = [
        (1, "POINT(3 4)"),
        (2, "LINESTRING(0 0, 5 -2, 3 7)"),
        (3, "POLYGON((1 1, 9 1, 9 6, 1 6, 1 1))"),
        (4, "POINT(-2.5 0.25)"),
    ]
    df = spark.createDataFrame(rows, "gid long, geometry string")
    out = {r.gid: r.bbox for r in df.select(
        "gid", geo.wkt_bbox("geometry").alias("bbox")).collect()}
    assert (out[1].xmin, out[1].ymin, out[1].xmax, out[1].ymax) == (3, 4, 3, 4)
    assert (out[2].xmin, out[2].ymin, out[2].xmax, out[2].ymax) == (0, -2, 5, 7)
    assert (out[3].xmin, out[3].ymin, out[3].xmax, out[3].ymax) == (1, 1, 9, 6)
    assert (out[4].xmin, out[4].ymin) == (-2.5, 0.25)


def test_bbox_intersects_truth_table(spark):
    # (a, b, expected): touching edges count as intersecting (closed)
    cases = [
        ((0, 0, 2, 2), (1, 1, 3, 3), True),
        ((0, 0, 2, 2), (2, 2, 3, 3), True),   # corner touch
        ((0, 0, 2, 2), (3, 0, 4, 2), False),  # x-separated
        ((0, 0, 2, 2), (0, 3, 2, 4), False),  # y-separated
        ((0, 0, 5, 5), (1, 1, 2, 2), True),   # containment
    ]
    rows = [([float(v) for v in a], [float(v) for v in b], e) for a, b, e in cases]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>, e boolean")

    def box(c):
        return F.struct(
            F.col(c)[0].alias("xmin"), F.col(c)[1].alias("ymin"),
            F.col(c)[2].alias("xmax"), F.col(c)[3].alias("ymax"),
        )

    out = df.select(
        geo.bbox_intersects(box("a"), box("b")).alias("got"), "e"
    ).collect()
    assert all(r.got == r.e for r in out)


def test_grid_join_equals_naive_filter(spark):
    """Grid-partitioned bbox join must equal the naive cross-join filter
    on random boxes/points — no duplicates (each pair meets in exactly
    one cell, the point's) and no misses across cell boundaries."""
    rng = random.Random(7)
    pts = [(i, rng.uniform(-30, 30), rng.uniform(-30, 30)) for i in range(300)]
    boxes = []
    for j in range(20):
        x0, y0 = rng.uniform(-35, 25), rng.uniform(-35, 25)
        boxes.append((j, x0, y0, x0 + rng.uniform(0.5, 18), y0 + rng.uniform(0.5, 18)))
    pdf = spark.createDataFrame(pts, "pid long, px double, py double")
    bdf = spark.createDataFrame(
        boxes, "bid long, xmin double, ymin double, xmax double, ymax double"
    ).select("bid", F.struct("xmin", "ymin", "xmax", "ymax").alias("bbox"))

    expected = {
        (p, b)
        for p, x, y in pts
        for b, x0, y0, x1, y1 in boxes
        if x0 <= x <= x1 and y0 <= y <= y1
    }
    for cell in (2.0, 7.0, 100.0):
        got = geo.grid_bbox_point_join(pdf, bdf, cell_size=cell)
        pairs = [(r.pid, r.bid) for r in got.select("pid", "bid").collect()]
        assert len(pairs) == len(set(pairs)), f"dup pairs at cell={cell}"
        assert set(pairs) == expected, f"mismatch at cell={cell}"


def _ring_df(spark, wkt, points):
    ring = spark.createDataFrame([(wkt,)], "geometry string").select(
        geo.wkt_xs("geometry").alias("xs"), geo.wkt_ys("geometry").alias("ys")
    )
    pts = spark.createDataFrame(points, "pid long, px double, py double")
    return pts.crossJoin(ring)


def test_point_in_polygon_concave(spark):
    # L-shape: concave — a pure bbox test would wrongly include (4,4)
    wkt = "POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))"
    points = [
        (1, 1.0, 1.0, True),    # in the bottom bar
        (2, 5.0, 1.5, True),    # in the bottom bar, right end
        (3, 1.0, 5.0, True),    # in the left bar
        (4, 4.0, 4.0, False),   # inside bbox, outside the L
        (5, 7.0, 1.0, False),   # outside bbox
        (6, 1.5, 2.5, True),    # just inside the left bar
        (7, 2.5, 2.5, False),   # just outside the notch corner
    ]
    df = _ring_df(spark, wkt, [(p, x, y) for p, x, y, _ in points])
    got = {
        r.pid: r.inside
        for r in df.select(
            "pid",
            geo.point_in_polygon(
                F.col("xs"), F.col("ys"), F.col("px"), F.col("py")
            ).alias("inside"),
        ).collect()
    }
    for pid, _, _, want in points:
        assert got[pid] == want, f"pid {pid}"


def test_point_in_polygon_matches_diamond_closed_form(spark):
    # diamond centered (10, 10), r=5.5 — closed form |dx|+|dy| < r
    wkt = "POLYGON((4.5 10.0, 10.0 4.5, 15.5 10.0, 10.0 15.5, 4.5 10.0))"
    points = [(i * 31 + j, float(i), float(j))
              for i in range(3, 18, 2) for j in range(3, 18, 2)]
    df = _ring_df(spark, wkt, points)
    got = {
        r.pid: r.inside
        for r in df.select(
            "pid",
            geo.point_in_polygon(
                F.col("xs"), F.col("ys"), F.col("px"), F.col("py")
            ).alias("inside"),
        ).collect()
    }
    for pid, x, y in points:
        assert got[pid] == (abs(x - 10) + abs(y - 10) < 5.5), f"({x},{y})"


def test_polygon_area_and_centroid(spark):
    rows = [
        # unit square: area 1, centroid (.5, .5)
        (1, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))", 1.0, 0.5, 0.5),
        # 3-4 right triangle: area 6, centroid (1, 4/3)
        (2, "POLYGON((0 0, 3 0, 0 4, 0 0))", 6.0, 1.0, 4.0 / 3),
        # clockwise square (reversed orientation): same unsigned results
        (3, "POLYGON((0 0, 0 1, 1 1, 1 0, 0 0))", 1.0, 0.5, 0.5),
        # L-shape: area 6*2 + 2*4 = 20, centroid from decomposition
        (4, "POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))", 20.0,
         (12 * 3 + 8 * 1) / 20, (12 * 1 + 8 * 4) / 20),
    ]
    df = spark.createDataFrame(
        [(g, w) for g, w, *_ in rows], "gid long, geometry string"
    ).select(
        "gid",
        geo.wkt_xs("geometry").alias("xs"), geo.wkt_ys("geometry").alias("ys")
    )
    cen = geo.polygon_centroid(F.col("xs"), F.col("ys"))
    out = {
        r.gid: r
        for r in df.select(
            "gid",
            geo.polygon_area(F.col("xs"), F.col("ys")).alias("area"),
            cen["cx"].alias("cx"), cen["cy"].alias("cy"),
        ).collect()
    }
    for gid, _, area, cx, cy in rows:
        assert abs(out[gid].area - area) < 1e-9
        assert abs(out[gid].cx - cx) < 1e-9 and abs(out[gid].cy - cy) < 1e-9


def test_grid_join_plan_is_broadcast_equi_join(spark):
    pdf = spark.createDataFrame([(1, 0.5, 0.5)], "pid long, px double, py double")
    bdf = spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0, 1.0)],
        "bid long, xmin double, ymin double, xmax double, ymax double",
    ).select("bid", F.struct("xmin", "ymin", "xmax", "ymax").alias("bbox"))
    plan = geo.grid_bbox_point_join(pdf, bdf, cell_size=1.0)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_radius_join_equals_naive(spark):
    rng = random.Random(13)
    pts = [(i, rng.uniform(0, 50), rng.uniform(0, 50)) for i in range(200)]
    ctrs = [(j, rng.uniform(0, 50), rng.uniform(0, 50)) for j in range(10)]
    pdf = spark.createDataFrame(pts, "pid long, px double, py double")
    cdf = spark.createDataFrame(ctrs, "cid long, cx double, cy double")
    R = 8.0
    expected = {
        (p, c)
        for p, x, y in pts
        for c, x0, y0 in ctrs
        if (x - x0) ** 2 + (y - y0) ** 2 <= R * R
    }
    got = geo.radius_point_join(pdf, cdf, radius=R)
    pairs = [(r.pid, r.cid) for r in got.collect()]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == expected
    for r in got.collect():
        assert r.dist <= R + 1e-9


def test_haversine_known_distances(spark):
    import math

    rows = [
        # 1 degree of longitude at the equator ~ 111.195 km
        (1, 0.0, 0.0, 0.0, 1.0, 2 * math.pi * 6371.0088 / 360),
        # pole to equator ~ quarter circumference
        (2, 90.0, 0.0, 0.0, 0.0, 2 * math.pi * 6371.0088 / 4),
        (3, 10.0, 20.0, 10.0, 20.0, 0.0),  # same point
    ]
    df = spark.createDataFrame(
        [(i, a, b, c, d) for i, a, b, c, d, _ in rows],
        "i long, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = {
        r.i: r.km
        for r in df.select(
            "i",
            geo.haversine_km(
                F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
            ).alias("km"),
        ).collect()
    }
    for i, *_, want in rows:
        assert abs(got[i] - want) < 0.01, (i, got[i], want)


# -- polygon-polygon overlay (r4) ------------------------------------------
def _closed_ring(pts):
    xs = [float(p[0]) for p in pts] + [float(pts[0][0])]
    ys = [float(p[1]) for p in pts] + [float(pts[0][1])]
    return xs, ys


def test_clip_convex_known_areas(spark):
    """Sutherland-Hodgman clip + shoelace vs hand-computed intersection
    areas: partial overlap, disjoint, containment, diamonds, and a
    CLOCKWISE clip ring (orientation-insensitivity)."""
    cases = [
        (_closed_ring([(0, 0), (2, 0), (2, 2), (0, 2)]),
         _closed_ring([(1, 1), (3, 1), (3, 3), (1, 3)]), 1.0),
        (_closed_ring([(0, 0), (1, 0), (1, 1), (0, 1)]),
         _closed_ring([(5, 5), (6, 5), (6, 6), (5, 6)]), 0.0),
        (_closed_ring([(1, 1), (2, 1), (2, 2), (1, 2)]),
         _closed_ring([(0, 0), (5, 0), (5, 5), (0, 5)]), 1.0),
        # diamonds r=2 at (0,0) and (1,1): rotated-square closed form
        # du=2, dv=4 -> 2*4/2 = 4
        (_closed_ring([(-2, 0), (0, -2), (2, 0), (0, 2)]),
         _closed_ring([(-1, 1), (1, -1), (3, 1), (1, 3)]), 4.0),
        # clockwise clip ring, same geometry as case 0
        (_closed_ring([(0, 0), (2, 0), (2, 2), (0, 2)]),
         _closed_ring([(1, 3), (3, 3), (3, 1), (1, 1)]), 1.0),
    ]
    rows = [(i, a[0], a[1], b[0], b[1]) for i, (a, b, _) in enumerate(cases)]
    df = spark.createDataFrame(
        rows,
        "id long, ax array<double>, ay array<double>, "
        "bx array<double>, by array<double>",
    )
    got = {
        r.id: r.area
        for r in df.select(
            "id",
            F.round(
                geo.polygon_area_points(
                    geo.clip_convex(
                        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")
                    )
                ),
                6,
            ).alias("area"),
        ).collect()
    }
    for i, (_, _, want) in enumerate(cases):
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)


def test_grid_bbox_bbox_join_no_dup_pairs(spark):
    """The reference-point dedup must yield each intersecting pair exactly
    once even when envelopes share many grid cells, and exactly the pairs
    whose envelopes intersect."""
    import itertools

    boxes = [(i, float(i), float(i), float(i) + 12.0, float(i) + 12.0)
             for i in range(8)]  # heavily overlapping, span many cells

    def frame(tag):
        return spark.createDataFrame(
            [(i, {"xmin": a, "ymin": b, "xmax": c, "ymax": d})
             for i, a, b, c, d in boxes],
            f"id_{tag} long, bbox_{tag} "
            "struct<xmin:double,ymin:double,xmax:double,ymax:double>",
        )

    got = geo.grid_bbox_bbox_join(
        frame("a"), frame("b"), cell_size=5.0,
        left_bbox="bbox_a", right_bbox="bbox_b",
    ).select("id_a", "id_b").collect()
    pairs = [(r.id_a, r.id_b) for r in got]
    assert len(pairs) == len(set(pairs)), "duplicate candidate pairs"
    expected = {
        (i, j)
        for (i, *a), (j, *b) in itertools.product(boxes, boxes)
        if a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]
    }
    assert set(pairs) == expected


def test_nearest_site_grid_equivalent_to_broadcast(spark, sf_dir):
    """The beyond-broadcast grid-ring path must be OUTPUT-IDENTICAL to
    the broadcast argmin (VERDICT r5 #4) on the registered query's
    inputs."""
    from pyspark.sql import functions as F

    from census_data_pipeline_spark.operators.geo import (
        nearest_site_join,
        nearest_site_join_grid,
    )
    from census_data_pipeline_spark.sources.catalog import load_table

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 13 % 120).cast("double") - 60 + 0.25)
        .alias("lat"),
        ((F.col("c_custkey") * 17 % 340).cast("double") - 170 + 0.25)
        .alias("lon"),
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("site_id"),
        ((F.col("n_nationkey") * 7 % 120).cast("double") - 60 + 0.5)
        .alias("lat"),
        ((F.col("n_nationkey") * 11 % 340).cast("double") - 170 + 0.5)
        .alias("lon"),
    )
    want = {tuple(r) for r in nearest_site_join(c, n).collect()}
    got = {tuple(r) for r in nearest_site_join_grid(c, n, cell_deg=15.0).collect()}
    assert got == want and len(got) == c.count()
    # small cells force multiple doubling rounds; result unchanged
    got_multi = {
        tuple(r) for r in nearest_site_join_grid(c, n, cell_deg=4.0).collect()
    }
    assert got_multi == want


def test_nearest_site_grid_poles_and_antimeridian(spark):
    """Adversarial geometry: sites across the ±180 seam are true
    neighbors (cyclic lon cells), and near-pole points where every
    meridian converges must still certify correctly."""
    from census_data_pipeline_spark.operators.geo import (
        nearest_site_join,
        nearest_site_join_grid,
    )

    pts = spark.createDataFrame(
        [
            (1, 0.0, 179.9),     # seam east side
            (2, 0.0, -179.9),    # seam west side
            (3, 89.5, 10.0),     # near north pole
            (4, -89.5, -170.0),  # near south pole
            (5, 0.0, 0.0),
            (6, 45.0, 90.0),
        ],
        "id long, lat double, lon double",
    )
    sites = spark.createDataFrame(
        [
            (100, 0.1, -179.95),  # closest to BOTH seam points
            (101, 0.0, 170.0),
            (102, 88.9, -160.0),  # near-pole site, far in lon only
            (103, -89.0, 20.0),
            (104, 1.0, 1.0),
            (105, 44.0, 91.0),
        ],
        "site_id long, lat double, lon double",
    )
    want = {tuple(r) for r in nearest_site_join(pts, sites).collect()}
    for cell in (15.0, 5.0, 45.0):
        got = {
            tuple(r)
            for r in nearest_site_join_grid(pts, sites, cell_deg=cell).collect()
        }
        assert got == want, (cell, got, want)
    # sanity: the seam points really resolved across the antimeridian
    by_id = {t[0]: t[1] for t in want}
    assert by_id[1] == 100 and by_id[2] == 100
    # and the near-pole point picked the lon-distant near-pole site
    assert by_id[3] == 102

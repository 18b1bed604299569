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

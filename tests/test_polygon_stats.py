"""Shoelace polygon stats (operators/spatial.py ring_from_points /
polygon_stats): exact scaled-int area, centroid, degenerate rings."""

import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("polygon-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _ring_df(spark, rings):
    rows = [(pid, [{"x": x, "y": y} for x, y in vs]) for pid, vs in rings]
    return spark.createDataFrame(
        rows, "polygon_id string, ring array<struct<x: bigint, y: bigint>>"
    )


def test_unit_square_ccw_and_cw(spark):
    ccw = [(0, 0), (1000, 0), (1000, 1000), (0, 1000)]
    out = {r.polygon_id: r for r in spatial.polygon_stats(_ring_df(
        spark, [("ccw", ccw), ("cw", list(reversed(ccw)))]
    )).collect()}
    assert out["ccw"].area2_scaled == 2 * 1000 * 1000
    assert out["cw"].area2_scaled == -2 * 1000 * 1000
    for k in ("ccw", "cw"):
        assert out[k].centroid_x == pytest.approx(500.0)
        assert out[k].centroid_y == pytest.approx(500.0)
        assert out[k].n_vertices == 4


def test_triangle_and_degenerate(spark):
    tri = [(0, 0), (2000, 0), (0, 2000)]
    seg = [(0, 0), (500, 500)]
    out = {r.polygon_id: r for r in spatial.polygon_stats(_ring_df(
        spark, [("tri", tri), ("seg", seg)]
    )).collect()}
    assert out["tri"].area2_scaled == 2000 * 2000
    assert out["tri"].centroid_x == pytest.approx(2000 / 3, abs=1e-4)
    assert out["seg"].area2_scaled == 0
    assert out["seg"].centroid_x is None and out["seg"].centroid_y is None


def test_ring_from_points_scaling_and_order(spark):
    pts = spark.createDataFrame(
        [("a", 3, 1.0005, 2.0), ("a", 1, 0.0, 0.0), ("a", 2, 1.0, 0.0)],
        "gid string, ord int, lon double, lat double",
    )
    rings = spatial.ring_from_points(
        pts, id_col="gid", order_col="ord"
    ).collect()
    assert len(rings) == 1
    assert [(v.x, v.y) for v in rings[0].ring] == [
        (0, 0), (1000, 0), (1001, 2000)  # 1.0005*1000 rounds HALF_UP to 1001
    ]

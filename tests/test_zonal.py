"""Zonal statistics (spatial.zonal_stats, grid_cell_center)."""

import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial

SQUARE = [(10, [(0.0, 0.01), (0.01, 10.0), (10.0, 9.99), (9.99, 0.0)])]


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("zonal-tests", master="local[4]",
                    shuffle_partitions=8)


def test_center_roundtrip(spark):
    pts = spark.createDataFrame(
        [(i, -180 + i * 3.17, -90 + i * 1.53) for i in range(100)],
        "pid int, lon double, lat double",
    )
    cell = spatial.grid_cell(F.col("lon"), F.col("lat"), 0.25)
    lon_c, lat_c = spatial.grid_cell_center(cell, 0.25)
    rows = pts.select(
        "lon", "lat", lon_c.alias("clon"), lat_c.alias("clat")
    ).collect()
    for r in rows:
        # the center is inside the point's own cell
        assert abs(r.clon - r.lon) <= 0.25 and abs(r.clat - r.lat) <= 0.25


def test_planted_zone_sums(spark):
    # raster of three cells: two with centers inside the near-square
    # polygon over (0..10)², one far away
    def cid(lon, lat):
        return int((lat + 90) / 0.25) * 1440 + int((lon + 180) / 0.25)

    raster = spark.createDataFrame(
        [
            (cid(2.1, 2.1), 5, 2),
            (cid(7.6, 7.6), 3, 1),
            (cid(100.0, 50.0), 11, 7),
        ],
        "cell bigint, n_pages bigint, n_tainted bigint",
    )
    out = spatial.zonal_stats(raster, SQUARE).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.polygon_id, r.n_cells, r.sum_n_pages, r.sum_n_tainted) \
        == (10, 2, 8, 3)


def test_aggregate_only_no_point_table(spark):
    """The overlay must not fan out the raster: Arrow-batched PIP over
    bbox candidates, no explode, no join of the raster against
    anything row-multiplying."""
    raster = spark.createDataFrame(
        [(1, 1, 0)], "cell bigint, n_pages bigint, n_tainted bigint")
    plan = (
        spatial.zonal_stats(raster, SQUARE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan, plan
    assert "Explode" not in plan and "Join" not in plan, plan

"""Two-table spatial radius join (operators/spatial.py radius_join) +
the neighbor_cells divisor guard."""

import random

import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("radius-join-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


def _df(spark, rows, idc):
    return spark.createDataFrame(rows, f"{idc} string, lon double, lat double")


def test_matches_bruteforce_randomized(spark):
    rng = random.Random(3)
    pts = [(f"p{i}", rng.uniform(-179, 179), rng.uniform(-89, 89))
           for i in range(80)]
    cands = [(f"c{i}", rng.uniform(-179, 179), rng.uniform(-89, 89))
             for i in range(80)]
    for radius, res in ((5.0, 5.0), (5.0, 9.0), (0.5, 0.5)):
        got = {
            (r.pid, r.cand_url)
            for r in spatial.radius_join(
                _df(spark, pts, "pid"), _df(spark, cands, "cand_url"),
                radius_deg=radius, point_id="pid", res_deg=res,
            ).collect()
        }
        want = set()
        for p, plon, plat in pts:
            for c, clon, clat in cands:
                dl = abs(plon - clon)
                dl = min(dl, 360 - dl)
                if dl * dl + (plat - clat) ** 2 <= radius * radius:
                    want.add((p, c))
        assert got == want, (radius, res)


def test_antimeridian_pair_and_dist2(spark):
    pts = _df(spark, [("p", 179.9, 0.0)], "pid")
    cands = _df(spark, [("c", -179.9, 0.0)], "cand_url")
    rows = spatial.radius_join(
        pts, cands, radius_deg=1.0, point_id="pid"
    ).collect()
    assert len(rows) == 1
    assert rows[0].dist2 == pytest.approx(0.04, abs=1e-12)


def test_res_below_radius_raises(spark):
    with pytest.raises(ValueError, match="res_deg"):
        spatial.radius_join(
            _df(spark, [("p", 0.0, 0.0)], "pid"),
            _df(spark, [("c", 0.0, 0.0)], "cand_url"),
            radius_deg=2.0, point_id="pid", res_deg=1.0,
        )


def test_non_divisor_resolution_raises(spark):
    """A resolution that does not divide 180 would silently clamp the
    top latitude band out of the probe set — neighbor_cells raises."""
    with pytest.raises(ValueError, match="divide 180"):
        spatial.radius_join(
            _df(spark, [("p", 0.0, 0.0)], "pid"),
            _df(spark, [("c", 0.0, 0.0)], "cand_url"),
            radius_deg=8.0, point_id="pid", res_deg=8.0,
        )


def test_top_lat_band_points_keep_their_cell(spark):
    """Points in the last latitude band (lat near +90) must see
    co-located candidates — the guard's motivating case at a coarse
    divisor resolution."""
    pts = _df(spark, [("p", 10.0, 89.5)], "pid")
    cands = _df(spark, [("c", 10.2, 89.4)], "cand_url")
    rows = spatial.radius_join(
        pts, cands, radius_deg=9.0, point_id="pid", res_deg=9.0
    ).collect()
    assert [(r.pid, r.cand_url) for r in rows] == [("p", "c")]

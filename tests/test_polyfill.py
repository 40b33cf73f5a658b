"""Polyfill (spatial.cell_polyfill) — a unit square's exact cover,
center-containment convention at cell boundaries, overlapping
polygons BOTH covered, consistency with pip on cell centers, fan
guard, twin parity."""

import math

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("polyfill-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 0.25
COLS = int(360 / RES)


def _run(spark, polys, res=RES):
    out = spatial.cell_polyfill(spark, polys, res_deg=res).collect()
    return {(r.polygon_id, r.cell) for r in out}


def _cell(lon, lat, res=RES):
    xb = int(math.floor((lon + 180) / res))
    yb = int(math.floor((lat + 90) / res))
    return yb * int(360 / res) + xb


def test_unit_square_cover(spark):
    # square [0,1]×[0,1] at 0.25°: exactly the 16 cells whose centers
    # (0.125 + k·0.25) lie strictly inside
    polys = [(7, [(0.0, 0.0), (1.0, 0.001), (1.001, 1.0), (0.001, 1.001)])]
    got = _run(spark, polys)
    want = {
        (7, _cell(0.125 + i * 0.25, 0.125 + j * 0.25))
        for i in range(4) for j in range(4)
    }
    assert got == want


def test_overlapping_polygons_both_emit(spark):
    sq = [(0.0, 0.0), (1.0, 0.001), (1.001, 1.0), (0.001, 1.001)]
    polys = [(1, sq), (2, sq)]
    got = _run(spark, polys)
    cells = {c for _, c in got}
    assert {p for p, _ in got} == {1, 2}
    assert len(got) == 2 * len(cells)


def test_triangle_consistent_with_mirror(spark):
    tri = [(0.0, 0.0), (4.0, 0.001), (0.001, 4.0)]
    got = _run(spark, [(3, tri)])

    def inside(x, y):
        # even-odd ray cast mirror
        crossings = 0
        ring = tri
        j = len(ring) - 1
        for i in range(len(ring)):
            xi, yi = ring[i]
            xj, yj = ring[j]
            if (yi > y) != (yj > y) and \
                    x < (xj - xi) * (y - yi) / (yj - yi) + xi:
                crossings += 1
            j = i
        return crossings % 2 == 1

    want = set()
    for i in range(20):
        for j in range(20):
            cx, cy = 0.125 + i * 0.25, 0.125 + j * 0.25
            if inside(cx, cy):
                want.add((3, _cell(cx, cy)))
    assert got == want


def test_fan_guard(spark):
    huge = [(-179.0, -89.0), (179.0, -88.999), (179.001, 89.0)]
    with pytest.raises(ValueError, match="max_cells_per_poly"):
        spatial.cell_polyfill(spark, [(1, huge)], res_deg=0.25,
                              max_cells_per_poly=1000)


def test_twin_parity(spark):
    from __spark_entry__ import PIP_POLYGONS

    got = _run(spark, PIP_POLYGONS)
    out = duckdb.connect().execute(
        spatial.cell_polyfill_sql(PIP_POLYGONS, res_deg=RES)
    ).fetchall()
    assert {(r[0], r[1]) for r in out} == got

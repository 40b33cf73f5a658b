"""3×3 focal stats over the cell raster (operators/spatial.py
tile_focal_stats): brute-force parity on a planted raster including
antimeridian wrap, pole clamp, and isolated cells; exact integer mean;
support does not dilate."""

import pytest
from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("focal-tests", master="local[4]", shuffle_partitions=8)
    yield s


COLS = int(360 / spatial.DEFAULT_RES_DEG)   # 1440
ROWS = int(180 / spatial.DEFAULT_RES_DEG)   # 720


def _cell(r, c):
    return r * COLS + c


def _brute(cells):
    vals = dict(cells)
    out = {}
    for (r, c), _ in cells:
        tot, n = 0, 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                rr, cc = r + dy, (c + dx + COLS) % COLS
                if 0 <= rr < ROWS and (rr, cc) in vals:
                    tot += vals[(rr, cc)]
                    n += 1
        out[_cell(r, c)] = (n, tot, tot * 1_000_000 // n)
    return out


def test_matches_bruteforce_with_wrap_and_clamp(spark):
    cells = [
        # a 2×3 block in the interior
        ((400, 100), 10), ((400, 101), 20), ((400, 102), 30),
        ((401, 100), 40), ((401, 101), 50), ((401, 102), 7),
        # antimeridian: col 0 and col 1439 are neighbors
        ((300, 0), 5), ((300, COLS - 1), 11),
        # pole clamp: row 0 has no row -1
        ((0, 700), 3), ((1, 700), 9),
        # isolated
        ((650, 1000), 42),
    ]
    df = spark.createDataFrame(
        [(_cell(r, c), v) for (r, c), v in cells], "cell bigint, v bigint"
    )
    got = {
        r.cell: (r.n_nbrs, r.nbr_sum, r.focal_mean_m)
        for r in spatial.tile_focal_stats(df, "v").collect()
    }
    assert got == _brute(cells)
    # spot checks: wrap pair sees each other
    assert got[_cell(300, 0)] == (2, 16, 8_000_000)
    assert got[_cell(300, COLS - 1)] == (2, 16, 8_000_000)
    # pole cell: only itself + the cell below
    assert got[_cell(0, 700)] == (2, 12, 6_000_000)
    # isolated: itself only, mean == value
    assert got[_cell(650, 1000)] == (1, 42, 42_000_000)
    # support does not dilate: no output for absent neighbor cells
    assert set(got) == {_cell(r, c) for (r, c), _ in cells}


def test_composes_with_tile_rollup(spark):
    """End-to-end: points → tile_rollup → focal mean; the center cell
    of a 3×3 populated block averages all nine counts."""
    pts = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # 0.25° cells around (10, 10); (dy+2)*(dx+2) points in each
            for k in range((dy + 2) * (dx + 2)):
                pts.append(
                    ("u%d%d%d" % (dy + 1, dx + 1, k),
                     10.125 + 0.25 * dx, 10.125 + 0.25 * dy, False)
                )
    df = spark.createDataFrame(pts, "url string, lon double, lat double, tainted boolean")
    rollup = spatial.tile_rollup(spatial.assign_cells(df)).select(
        "cell", "n_pages"
    )
    out = {
        r.cell: (r.n_nbrs, r.nbr_sum)
        for r in spatial.tile_focal_stats(rollup, "n_pages").collect()
    }
    center = spatial.grid_cell(F.lit(10.125), F.lit(10.125))
    center_id = df.select(center.alias("c")).first().c
    total = sum((dy + 2) * (dx + 2) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    assert out[center_id] == (9, total)

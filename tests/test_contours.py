"""Marching-squares contour topology (spatial.tile_contours) —
planted shapes with hand-derived case indices, saddle handling,
lon-wrap topology, and DuckDB twin parity on random supports."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("contour-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 1.0
COLS = 360
ROWS = 180


def _cell(y, x):
    return y * COLS + x


def _run(spark, cells):
    sdf = spark.createDataFrame([(c,) for c in cells], "cell bigint")
    return {
        r.cell: (r.ms_case, r.n_segments)
        for r in spatial.tile_contours(sdf, res_deg=RES).collect()
    }


def test_single_cell_four_corner_blocks(spark):
    """One occupied interior cell corners exactly 4 blocks, one per
    weight, each crossed by one segment."""
    got = _run(spark, [_cell(50, 50)])
    assert got == {
        _cell(50, 50): (1, 1),
        _cell(50, 49): (2, 1),
        _cell(49, 49): (4, 1),
        _cell(49, 50): (8, 1),
    }


def test_filled_square_interior_filtered(spark):
    """A 2×2 filled square: the center block is all-inside (case 15,
    dropped); the 8 surrounding blocks carry the full boundary."""
    y, x = 60, 70
    cells = [_cell(y, x), _cell(y, x + 1),
             _cell(y + 1, x), _cell(y + 1, x + 1)]
    got = _run(spark, cells)
    assert _cell(y, x) not in got
    want = {
        _cell(y - 1, x - 1): 4, _cell(y - 1, x): 12,
        _cell(y - 1, x + 1): 8, _cell(y, x - 1): 6,
        _cell(y, x + 1): 9, _cell(y + 1, x - 1): 2,
        _cell(y + 1, x): 3, _cell(y + 1, x + 1): 1,
    }
    assert {c: mc for c, (mc, _) in got.items()} == want
    assert all(ns == 1 for _, ns in got.values())


def test_saddle_two_segments(spark):
    """Diagonal corners occupied → case 5, the 2-segment saddle."""
    got = _run(spark, [_cell(30, 30), _cell(31, 31)])
    assert got[_cell(30, 30)] == (5, 2)


def test_lon_wrap_block(spark):
    """A cell in lon column 0 corners a block anchored in the last
    column — antimeridian blocks exist."""
    got = _run(spark, [_cell(40, 0)])
    assert got[_cell(40, COLS - 1)] == (2, 1)


def test_lat_clamp_no_polar_block(spark):
    """Cells in the top lat row anchor no block above the grid (a
    block spans two rows), so a lone top-row cell corners only the
    row below's blocks."""
    got = _run(spark, [_cell(ROWS - 1, 10)])
    assert set(got) == {_cell(ROWS - 2, 10), _cell(ROWS - 2, 9)}
    assert got[_cell(ROWS - 2, 10)] == (8, 1)
    assert got[_cell(ROWS - 2, 9)] == (4, 1)


def _python_contours(cells):
    occ = set(cells)
    blocks = {}
    for c in occ:
        y, x = divmod(c, COLS)
        for dy, dx, w in ((0, 0, 1), (0, 1, 2), (1, 1, 4), (1, 0, 8)):
            ay = y - dy
            if 0 <= ay < ROWS - 1:
                ax = (x - dx) % COLS
                b = ay * COLS + ax
                blocks[b] = blocks.get(b, 0) + w
    return {
        b: (mc, spatial.MS_SEGMENTS[mc])
        for b, mc in blocks.items() if mc != 15
    }


def test_random_support_vs_python_and_duckdb(spark):
    rng = random.Random(2024)
    cells = sorted({
        _cell(rng.randrange(ROWS), rng.randrange(COLS))
        for _ in range(300)
    } | {
        _cell(85 + dy, 120 + dx) for dy in range(4) for dx in range(5)
    })
    want = _python_contours(cells)
    assert _run(spark, cells) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE occ (cell BIGINT)")
    con.executemany("INSERT INTO occ VALUES (?)", [(c,) for c in cells])
    twin = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            spatial.tile_contours_sql("occ", res_deg=RES)
        ).fetchall()
    }
    assert twin == want


# ---------------------------------------------------------------------------
# raster_distance (corridor BFS over the support)
# ---------------------------------------------------------------------------

def test_raster_distance_corridor_and_gap(spark):
    """A 4-cell corridor from the seed walks 1,2,3; an occupied cell
    separated by open water stays NULL even though it is near."""
    corridor = [_cell(50, 50), _cell(50, 51), _cell(51, 52), _cell(52, 52)]
    island = [_cell(50, 55)]
    cells = spark.createDataFrame(
        [(c,) for c in corridor + island], "cell bigint"
    )
    seeds = spark.createDataFrame([(corridor[0],)], "cell bigint")
    got = {
        r.cell: r.dist
        for r in spatial.raster_distance(
            cells, seeds, rounds=6, res_deg=RES
        ).collect()
    }
    assert got == {
        corridor[0]: 0, corridor[1]: 1, corridor[2]: 2, corridor[3]: 3,
        island[0]: None,
    }


def test_raster_distance_lon_wrap(spark):
    """The corridor crosses the antimeridian via lon wrap."""
    cells_l = [_cell(10, COLS - 1), _cell(10, 0)]
    cells = spark.createDataFrame([(c,) for c in cells_l], "cell bigint")
    seeds = spark.createDataFrame([(cells_l[0],)], "cell bigint")
    got = {
        r.cell: r.dist
        for r in spatial.raster_distance(
            cells, seeds, rounds=3, res_deg=RES
        ).collect()
    }
    assert got == {cells_l[0]: 0, cells_l[1]: 1}


def test_raster_distance_duckdb_twin(spark):
    rng = random.Random(40)
    occ = sorted({
        _cell(30 + rng.randrange(8), 30 + rng.randrange(8))
        for _ in range(30)
    })
    seeds_l = occ[:4]
    cells = spark.createDataFrame([(c,) for c in occ], "cell bigint")
    seeds = spark.createDataFrame([(c,) for c in seeds_l], "cell bigint")
    got = {
        r.cell: r.dist
        for r in spatial.raster_distance(
            cells, seeds, rounds=5, res_deg=RES
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE occ (cell BIGINT)")
    con.executemany("INSERT INTO occ VALUES (?)", [(c,) for c in occ])
    con.execute("CREATE TABLE sd (cell BIGINT)")
    con.executemany("INSERT INTO sd VALUES (?)", [(c,) for c in seeds_l])
    twin = dict(
        con.execute(
            spatial.raster_distance_sql("occ", "sd", rounds=5, res_deg=RES)
        ).fetchall()
    )
    assert twin == got and any(v and v >= 2 for v in got.values())

"""Slope/aspect raster derivative (spatial.raster_aspect) — planted
ramps with known downhill directions, zero-fill edge semantics, exact
tie → diagonal, lon wrap, a plain-Python mirror, and DuckDB twin
parity on a random raster."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("aspect-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 10.0          # 36 × 18 grid
COLS, ROWS = 36, 18


def _cell(cx, cy):
    return cy * COLS + cx


def _python_aspect(cells, res_deg=RES):
    """cells: {cell: v} → {cell: (gx, gy, slope_sq, aspect)}."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)

    def val(cy, cx):
        if not (0 <= cy < rows_n):
            return 0
        return cells.get(cy * cols + (cx % cols), 0)

    out = {}
    for c in cells:
        cy, cx = divmod(c, cols)
        gx = val(cy, cx + 1) - val(cy, cx - 1)
        gy = val(cy + 1, cx) - val(cy - 1, cx)
        if gx == 0 and gy == 0:
            a = "flat"
        elif abs(gx) > abs(gy):
            a = "W" if gx > 0 else "E"
        elif abs(gy) > abs(gx):
            a = "S" if gy > 0 else "N"
        else:
            a = ("S" if gy > 0 else "N") + ("W" if gx > 0 else "E")
        out[c] = (gx, gy, gx * gx + gy * gy, a)
    return out


def _spark_aspect(spark, cells):
    df = spark.createDataFrame(
        [(c, v) for c, v in cells.items()], "cell bigint, v bigint"
    )
    rows = spatial.raster_aspect(df, "v", res_deg=RES).collect()
    return {
        r["cell"]: (r["gx"], r["gy"], r["slope_sq"], r["aspect"])
        for r in rows
    }


def test_east_ramp_faces_west(spark):
    """v = 10·cx (uphill eastward) → interior aspect W, slope (20)²."""
    cells = {_cell(cx, 8): 10 * cx for cx in range(5, 12)}
    got = _spark_aspect(spark, cells)
    assert got == _python_aspect(cells)
    # interior cells: gx = v(E)−v(W) = 20, gy = 0 → downhill W
    assert got[_cell(8, 8)] == (20, 0, 400, "W")


def test_north_ramp_faces_south(spark):
    """v grows with cy (northward) → interior aspect S."""
    cells = {_cell(7, cy): 5 * cy for cy in range(4, 12)}
    got = _spark_aspect(spark, cells)
    assert got == _python_aspect(cells)
    assert got[_cell(7, 8)] == (0, 10, 100, "S")


def test_exact_tie_goes_diagonal(spark):
    """|gx| = |gy| ≠ 0 → two-letter diagonal aspect."""
    c = _cell(10, 9)
    cells = {
        c: 50,
        _cell(11, 9): 60,   # E higher  → gx=60
        _cell(9, 9): 0,     # W absent-like explicit 0
        _cell(10, 10): 60,  # N higher  → gy=60
        _cell(10, 8): 0,
    }
    got = _spark_aspect(spark, cells)
    assert got == _python_aspect(cells)
    assert got[c] == (60, 60, 7200, "SW")


def test_isolated_cell_is_flat(spark):
    """No neighbors at all → gx=gy=0 → 'flat' (zero-fill)."""
    cells = {_cell(3, 3): 999}
    got = _spark_aspect(spark, cells)
    assert got[_cell(3, 3)] == (0, 0, 0, "flat")


def test_zero_fill_edge_asymmetry(spark):
    """A lone high cell's neighbor sees only ONE side: the W edge of a
    2-cell pair has gx = v(E) − 0."""
    cells = {_cell(6, 6): 0, _cell(7, 6): 40}
    got = _spark_aspect(spark, cells)
    assert got == _python_aspect(cells)
    assert got[_cell(6, 6)] == (40, 0, 1600, "W")
    assert got[_cell(7, 6)] == (-0 - 0, 0, 0, "flat") or \
        got[_cell(7, 6)] == (0 - 0, 0, 0, "flat")


def test_lon_wrap_gradient(spark):
    """cx=0's west neighbor is cx=COLS−1 through the antimeridian."""
    cells = {_cell(0, 8): 10, _cell(COLS - 1, 8): 30}
    got = _spark_aspect(spark, cells)
    assert got == _python_aspect(cells)
    assert got[_cell(0, 8)] == (-30, 0, 900, "E")


def test_pole_row_clamps(spark):
    """cy=0's south neighbor is off-grid → contributes 0, no crash."""
    cells = {_cell(5, 0): 10, _cell(5, 1): 25}
    got = _spark_aspect(spark, cells)
    assert got == _python_aspect(cells)
    assert got[_cell(5, 0)] == (0, 25, 625, "S")


def test_support_does_not_dilate(spark):
    """Output keys == input keys exactly (no halo rows)."""
    cells = {_cell(4, 4): 5, _cell(5, 4): 9}
    got = _spark_aspect(spark, cells)
    assert set(got) == set(cells)


def test_coarse_grid_raises(spark):
    df = spark.createDataFrame([(0, 1)], "cell bigint, v bigint")
    with pytest.raises(ValueError, match="grid columns"):
        spatial.raster_aspect(df, "v", res_deg=90.0)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(7531)
    cells = {}
    for _ in range(200):
        cells[_cell(rng.randrange(COLS), rng.randrange(ROWS))] = (
            rng.randrange(0, 300)
        )
    want = _python_aspect(cells)
    assert _spark_aspect(spark, cells) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE ras (cell BIGINT, v BIGINT)")
    con.executemany("INSERT INTO ras VALUES (?, ?)", list(cells.items()))
    rows = con.execute(spatial.raster_aspect_sql("ras", "v", RES)).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == want

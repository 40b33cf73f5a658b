"""Local Moran's I (spatial.local_morans) — Anselin's LISA per cell:
planted hotspot/coldspot/outlier quadrants, the exact decomposition
identity against the global statistic, and twin parity on random
rasters (plain-Python mirror + DuckDB)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("local-morans-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 10.0          # 36 × 18 grid
COLS, ROWS = 36, 18


def _cell(cx, cy):
    return cy * COLS + cx


def _python_local(cells, res_deg=RES):
    """cells: {cell: x} → {cell: (n_nbrs, d, lag, i_ppm, quadrant)}."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    n = len(cells)
    s = sum(cells.values())
    d = {c: n * x - s for c, x in cells.items()}
    den = sum(v * v for v in d.values())
    out = {}
    for c in cells:
        cy, cx = divmod(c, cols)
        lag = 0
        n_nbrs = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ty, tx = cy + dy, (cx + dx + cols) % cols
                if 0 <= ty < rows_n and (ty * cols + tx) in cells:
                    lag += d[ty * cols + tx]
                    n_nbrs += 1
        if den == 0:
            ippm, quad = None, None
        else:
            q = n * d[c] * lag * 1_000_000 / den
            ippm = int(q)  # trunc toward zero = DIV = //
            if d[c] > 0 and lag > 0:
                quad = "HH"
            elif d[c] < 0 and lag < 0:
                quad = "LL"
            elif d[c] > 0 and lag < 0:
                quad = "HL"
            elif d[c] < 0 and lag > 0:
                quad = "LH"
            else:
                quad = "M0"
        out[c] = (n_nbrs, d[c], lag, ippm, quad)
    return out


def _spark_local(spark, cells):
    df = spark.createDataFrame(
        [(c, x) for c, x in cells.items()], "cell bigint, x bigint"
    )
    rows = spatial.local_morans(df, "x", res_deg=RES).collect()
    assert len(rows) == len(cells)
    return {
        r["cell"]: (r["n_nbrs"], r["d"], r["lag"], r["i_ppm"],
                    r["quadrant"])
        for r in rows
    }


def test_quadrants_planted(spark):
    """A high plateau next to a low basin on a mid ground: plateau
    interior cells are HH, basin interior LL; a single spike in the
    basin is HL and its neighbors under the basin mean stay LL."""
    cells = {}
    for cx in range(2, 7):
        for cy in range(2, 7):
            cells[_cell(cx, cy)] = 1000      # plateau
    for cx in range(12, 17):
        for cy in range(2, 7):
            cells[_cell(cx, cy)] = 10        # basin
    cells[_cell(14, 4)] = 5000               # spike inside the basin
    got = _spark_local(spark, cells)
    assert got == _python_local(cells)
    assert got[_cell(4, 4)][4] == "HH"       # plateau interior
    assert got[_cell(12, 2)][4] == "LL"      # basin cell off the spike
    assert got[_cell(14, 4)][4] == "HL"      # the spike: high in a low nbhd
    # spike neighbors: low value, but the spike pushes their lag up
    assert got[_cell(14, 3)][4] == "LH"


def test_global_decomposition(spark):
    """Σ_i d_i·lag_i equals the global directed pair sum: the local
    statistics decompose the global Moran numerator exactly."""
    rng = random.Random(99)
    cells = {}
    for _ in range(120):
        cells[_cell(rng.randrange(COLS), rng.randrange(ROWS))] = (
            rng.randrange(1, 300)
        )
    got = _spark_local(spark, cells)
    df = spark.createDataFrame(
        [(c, x) for c, x in cells.items()], "cell bigint, x bigint"
    )
    g = spatial.morans_i(df, "x", res_deg=RES).head()
    assert sum(d * lag for (_, d, lag, _, _) in got.values()) == g["num"]
    assert all(v[0] <= 8 for v in got.values())


def test_constant_surface_null(spark):
    cells = {_cell(cx, 6): 7 for cx in range(4, 9)}
    got = _spark_local(spark, cells)
    assert all(v[3] is None and v[4] is None for v in got.values())


def test_isolated_cell_m0(spark):
    """A present cell with no present neighbors: lag 0, i_ppm 0, 'M0'."""
    cells = {_cell(2, 2): 5, _cell(20, 10): 9}
    got = _spark_local(spark, cells)
    assert got == _python_local(cells)
    for v in got.values():
        assert v[0] == 0 and v[2] == 0 and v[3] == 0 and v[4] == "M0"


def test_lon_wrap_neighbor(spark):
    """cx=0 and cx=COLS-1 in one row are queen-adjacent through the
    antimeridian — both see the other's deviation in their lag."""
    cells = {_cell(0, 8): 3, _cell(COLS - 1, 8): 9, _cell(10, 2): 6}
    got = _spark_local(spark, cells)
    assert got == _python_local(cells)
    assert got[_cell(0, 8)][0] == 1
    assert got[_cell(COLS - 1, 8)][0] == 1
    assert got[_cell(10, 2)][0] == 0


def test_coarse_grid_raises(spark):
    df = spark.createDataFrame([(0, 1)], "cell bigint, x bigint")
    with pytest.raises(ValueError, match="grid columns"):
        spatial.local_morans(df, "x", res_deg=90.0)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(2026)
    cells = {}
    for _ in range(150):
        cells[_cell(rng.randrange(COLS), rng.randrange(ROWS))] = (
            rng.randrange(1, 500)
        )
    want = _python_local(cells)
    assert _spark_local(spark, cells) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE ras (cell BIGINT, x BIGINT)")
    con.executemany("INSERT INTO ras VALUES (?, ?)", list(cells.items()))
    rows = con.execute(
        spatial.local_morans_sql("ras", "x", RES)
    ).fetchall()
    got = {r[0]: tuple(r[1:]) for r in rows}
    want_t = {c: (v[0], v[1], v[2], v[3], v[4]) for c, v in want.items()}
    assert got == want_t

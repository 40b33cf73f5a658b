"""Global Geary's C (spatial.gearys_c) — planted clustered /
checkerboard / constant rasters with known position vs 1, a
plain-Python mirror of the exact integer recurrence, DuckDB twin
parity on random rasters, and the C-vs-I sign complementarity on the
same planted surfaces (Geary: <1 clusters, >1 checkerboard)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gearys-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 10.0          # 36 × 18 grid
COLS, ROWS = 36, 18


def _cell(cx, cy):
    return cy * COLS + cx


def _python_gearys(cells, res_deg=RES):
    """cells: {cell: x} — mirror of the operator's exact recurrence."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    n = len(cells)
    s = sum(cells.values())
    num_fwd = 0
    pairs = 0
    for c, x in cells.items():
        cy, cx = divmod(c, cols)
        for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
            ty, tx = cy + dy, (cx + dx + cols) % cols
            if 0 <= ty < rows_n:
                nbr = ty * cols + tx
                if nbr in cells:
                    num_fwd += (x - cells[nbr]) ** 2
                    pairs += 1
    w = 2 * pairs
    num = 2 * num_fwd
    den = sum((n * x - s) ** 2 for x in cells.values())
    if den == 0 or w == 0:
        cppm = None
    else:
        q = ((n - 1) * n * n * num * 1_000_000) // (2 * w * den)
        cppm = int(q)  # all factors ≥ 0: // == trunc == DIV
    return (n, w, num, den, cppm)


def _spark_gearys(spark, cells):
    df = spark.createDataFrame(
        [(c, x) for c, x in cells.items()], "cell bigint, x bigint"
    )
    r = spatial.gearys_c(df, "x", res_deg=RES).head()
    return (r["n_cells"], r["w_sum"], r["num"], r["den"], r["c_ppm"])


def test_clustered_below_one(spark):
    """A smooth gradient patch (similar neighbors) → C < 1 (ppm < 1e6)."""
    cells = {
        _cell(cx, cy): 10 * cx + cy
        for cx in range(5, 11) for cy in range(5, 11)
    }
    got = _spark_gearys(spark, cells)
    assert got == _python_gearys(cells)
    assert 0 < got[4] < 1_000_000


def test_checkerboard_above_one(spark):
    """Alternating high/low → C > 1 (neighbors maximally different)."""
    cells = {
        _cell(cx, cy): 100 if (cx + cy) % 2 == 0 else 1
        for cx in range(4, 10) for cy in range(4, 10)
    }
    got = _spark_gearys(spark, cells)
    assert got == _python_gearys(cells)
    assert got[4] > 1_000_000


def test_constant_surface_null(spark):
    """den = 0 (all values equal) → NULL c_ppm; num is also 0."""
    cells = {_cell(cx, 6): 7 for cx in range(4, 9)}
    got = _spark_gearys(spark, cells)
    assert got[2] == 0 and got[3] == 0 and got[4] is None


def test_isolated_cells_zero_pairs(spark):
    """No adjacent pairs → w_sum = 0 → NULL c_ppm."""
    cells = {_cell(2, 2): 5, _cell(20, 10): 9}
    got = _spark_gearys(spark, cells)
    assert got[1] == 0 and got[4] is None


def test_lon_wrap_pair_counted(spark):
    """cx=0 / cx=COLS−1 in one row pair through the antimeridian;
    num is the doubled squared difference."""
    cells = {_cell(0, 8): 3, _cell(COLS - 1, 8): 4}
    got = _spark_gearys(spark, cells)
    assert got[1] == 2 and got[2] == 2  # (3−4)² both directions
    assert got == _python_gearys(cells)


def test_complements_morans_on_same_surfaces(spark):
    """On the SAME planted surfaces Geary and Moran must agree in
    verdict: gradient → I>0 ∧ C<1; checkerboard → I<0 ∧ C>1."""
    grad = {
        _cell(cx, cy): 10 * cx + cy
        for cx in range(5, 11) for cy in range(5, 11)
    }
    chk = {
        _cell(cx, cy): 100 if (cx + cy) % 2 == 0 else 1
        for cx in range(4, 10) for cy in range(4, 10)
    }
    for cells, want_i_pos, want_c_below in (
        (grad, True, True), (chk, False, False)
    ):
        df = spark.createDataFrame(
            [(c, x) for c, x in cells.items()], "cell bigint, x bigint"
        )
        i_ppm = spatial.morans_i(df, "x", res_deg=RES).head()["i_ppm"]
        c_ppm = spatial.gearys_c(df, "x", res_deg=RES).head()["c_ppm"]
        assert (i_ppm > 0) is want_i_pos
        assert (c_ppm < 1_000_000) is want_c_below


def test_coarse_grid_raises(spark):
    df = spark.createDataFrame([(0, 1)], "cell bigint, x bigint")
    with pytest.raises(ValueError, match="grid columns"):
        spatial.gearys_c(df, "x", res_deg=90.0)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(8642)
    cells = {}
    for _ in range(150):
        cells[_cell(rng.randrange(COLS), rng.randrange(ROWS))] = (
            rng.randrange(1, 500)
        )
    want = _python_gearys(cells)
    assert _spark_gearys(spark, cells) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE ras (cell BIGINT, x BIGINT)")
    con.executemany("INSERT INTO ras VALUES (?, ?)", list(cells.items()))
    row = con.execute(spatial.gearys_c_sql("ras", "x", RES)).fetchone()
    assert tuple(row) == want

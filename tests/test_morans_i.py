"""Global Moran's I (spatial.morans_i) — planted clustered /
checkerboard / constant rasters with known signs, a plain-Python
mirror of the exact integer recurrence, and DuckDB twin parity on
random rasters."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("morans-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 10.0          # 36 × 18 grid
COLS, ROWS = 36, 18


def _cell(cx, cy):
    return cy * COLS + cx


def _python_morans(cells, res_deg=RES):
    """cells: {cell: x} — mirror of the operator's exact recurrence."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    n = len(cells)
    s = sum(cells.values())
    d = {c: n * x - s for c, x in cells.items()}
    num_fwd = 0
    pairs = 0
    for c in cells:
        cy, cx = divmod(c, cols)
        for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
            ty, tx = cy + dy, (cx + dx + cols) % cols
            if 0 <= ty < rows_n:
                nbr = ty * cols + tx
                if nbr in cells:
                    num_fwd += d[c] * d[nbr]
                    pairs += 1
    w = 2 * pairs
    num = 2 * num_fwd
    den = sum(v * v for v in d.values())
    if den == 0 or w == 0:
        ippm = None
    else:
        q = (n * num * 1_000_000) / (w * den)
        ippm = int(q)  # trunc toward zero, matching DIV / //
    return (n, w, num, den, ippm)


def _spark_morans(spark, cells):
    df = spark.createDataFrame(
        [(c, x) for c, x in cells.items()], "cell bigint, x bigint"
    )
    r = spatial.morans_i(df, "x", res_deg=RES).head()
    return (r["n_cells"], r["w_sum"], r["num"], r["den"], r["i_ppm"])


def test_clustered_positive(spark):
    """A smooth gradient patch (similar neighbors) → I > 0."""
    cells = {
        _cell(cx, cy): 10 * cx + cy
        for cx in range(5, 11) for cy in range(5, 11)
    }
    got = _spark_morans(spark, cells)
    assert got == _python_morans(cells)
    assert got[4] > 0


def test_checkerboard_negative(spark):
    """Alternating high/low → I < 0."""
    cells = {
        _cell(cx, cy): 100 if (cx + cy) % 2 == 0 else 1
        for cx in range(4, 10) for cy in range(4, 10)
    }
    got = _spark_morans(spark, cells)
    assert got == _python_morans(cells)
    assert got[4] < 0


def test_constant_surface_null(spark):
    """den = 0 (all values equal) → NULL i_ppm, not a crash."""
    cells = {_cell(cx, 6): 7 for cx in range(4, 9)}
    got = _spark_morans(spark, cells)
    assert got[3] == 0 and got[4] is None


def test_isolated_cells_zero_pairs(spark):
    """No adjacent pairs → w_sum = 0 → NULL i_ppm."""
    cells = {_cell(2, 2): 5, _cell(20, 10): 9}
    got = _spark_morans(spark, cells)
    assert got[1] == 0 and got[4] is None


def test_lon_wrap_pair_counted(spark):
    """Cells at cx=0 and cx=COLS-1 in one row are queen-adjacent
    through the antimeridian (the E-forward of the last column)."""
    cells = {_cell(0, 8): 3, _cell(COLS - 1, 8): 4}
    got = _spark_morans(spark, cells)
    assert got[1] == 2  # one undirected pair, both directions
    assert got == _python_morans(cells)


def test_coarse_grid_raises(spark):
    df = spark.createDataFrame([(0, 1)], "cell bigint, x bigint")
    with pytest.raises(ValueError, match="grid columns"):
        spatial.morans_i(df, "x", res_deg=90.0)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(4321)
    cells = {}
    for _ in range(150):
        cells[_cell(rng.randrange(COLS), rng.randrange(ROWS))] = (
            rng.randrange(1, 500)
        )
    want = _python_morans(cells)
    assert _spark_morans(spark, cells) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE ras (cell BIGINT, x BIGINT)")
    con.executemany("INSERT INTO ras VALUES (?, ?)", list(cells.items()))
    row = con.execute(spatial.morans_i_sql("ras", "x", RES)).fetchone()
    assert tuple(row) == want

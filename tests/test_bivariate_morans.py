"""Bivariate local Moran's I (spatial.bivariate_morans) — planted
cross-variable colocation quadrants, the Σdx·lag_y ≡ Σdy·lag_x
adjacency symmetry, constant-X degeneracy, x=y reduction to the
univariate local_morans, and DuckDB twin parity on random rasters."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("bivariate-morans-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 1.0
COLS = 360


def _cell(lon_b, lat_b):
    return lat_b * COLS + lon_b


def _df(spark, rows):
    return spark.createDataFrame(rows, "cell bigint, x bigint, y bigint")


def _collect(spark, rows):
    out = spatial.bivariate_morans(
        _df(spark, rows), "x", "y", res_deg=RES
    ).collect()
    return {
        r["cell"]: (r["n_nbrs"], r["dx"], r["lag_y"], r["ixy_ppm"],
                    r["quadrant"])
        for r in out
    }


def test_hh_colocation(spark):
    """X-hot cell whose neighbor is Y-hot, on a background of zeros →
    the hot cell labels HH."""
    c0, c1 = _cell(100, 100), _cell(101, 100)
    rows = [(c0, 50, 0), (c1, 0, 50)]
    rows += [(_cell(10 + i, 20), 0, 0) for i in range(8)]
    got = _collect(spark, rows)
    assert got[c0][4] == "HH"
    assert got[c0][3] > 0


def test_hl_anticolocation(spark):
    c0, c1 = _cell(100, 100), _cell(101, 100)
    # X hot at c0; Y high EVERYWHERE EXCEPT c1 (so c0's lag_y < 0)
    rows = [(c0, 50, 10), (c1, 0, 0)]
    rows += [(_cell(10 + i, 20), 0, 10) for i in range(8)]
    got = _collect(spark, rows)
    assert got[c0][4] == "HL"
    assert got[c0][3] < 0


def test_constant_x_null(spark):
    rows = [(_cell(10 + i, 20), 7, i) for i in range(6)]
    got = _collect(spark, rows)
    assert all(v[3] is None and v[4] is None for v in got.values())


def test_adjacency_symmetry(spark):
    """Σᵢ dxᵢ·lag_yᵢ = Σ_{(i,j) adjacent} dxᵢ·dyⱼ is symmetric under
    swapping the fields (queen adjacency is symmetric)."""
    rng = random.Random(5)
    rows = [
        (_cell(50 + i % 6, 40 + i // 6), rng.randrange(0, 30),
         rng.randrange(0, 30))
        for i in range(30)
    ]
    xy = _collect(spark, rows)
    yx = _collect(spark, [(c, y, x) for c, x, y in rows])
    sum_xy = sum(v[1] * v[2] for v in xy.values())
    sum_yx = sum(v[1] * v[2] for v in yx.values())
    assert sum_xy == sum_yx


def test_x_equals_y_reduces_to_univariate(spark):
    rng = random.Random(6)
    rows = [
        (_cell(80 + i % 5, 60 + i // 5), rng.randrange(0, 40))
        for i in range(25)
    ]
    uni = {
        r["cell"]: (r["n_nbrs"], r["d"], r["lag"], r["i_ppm"],
                    r["quadrant"])
        for r in spatial.local_morans(
            spark.createDataFrame(rows, "cell bigint, v bigint"),
            "v", res_deg=RES,
        ).collect()
    }
    biv = _collect(spark, [(c, v, v) for c, v in rows])
    assert biv == uni


def test_random_vs_duckdb(spark):
    rng = random.Random(44)
    cells = set()
    while len(cells) < 60:
        cells.add(_cell(rng.randrange(30, 45), rng.randrange(30, 45)))
    rows = [
        (c, rng.randrange(0, 100), rng.randrange(0, 100))
        for c in sorted(cells)
    ]
    want = _collect(spark, rows)

    con = duckdb.connect()
    con.execute("CREATE TABLE r (cell BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", rows)
    got = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(
            "WITH " + spatial.bivariate_morans_ctes("r", "x", "y", RES)
        ).fetchall()
    }
    assert got == want

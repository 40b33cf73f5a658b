"""Quadrat CSR test (spatial.quadrat_test) — perfect uniformity,
one-cell clustering, half-open boundaries, out-of-bbox accounting,
empty cells counted via C, validation, random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("quad-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "lon double, lat double"
BBOX = (0.0, 0.0, 2.0, 2.0)


def _run(spark, rows, bbox=BBOX, res=1.0):
    df = spark.createDataFrame(rows, SCHEMA)
    out = spatial.quadrat_test(df, bbox, res).collect()
    r = out[0]
    return (r.n_in, r.n_out, r.n_cells, r.occupied, r.chi2_ppm,
            r.vmr_ppm)


def _mirror(rows, bbox=BBOX, res=1.0, scale=10_000):
    def q(v):
        s = v * scale
        return int(s + 0.5) if s >= 0 else -int(-s + 0.5)

    x0, y0, x1, y1 = (int(v * scale) for v in bbox)
    g = int(res * scale)
    cols = (x1 - x0) // g
    c_cnt = cols * ((y1 - y0) // g)
    cells = {}
    n_out = 0
    for lo, la in rows:
        x, y = q(lo), q(la)
        if not (x0 <= x < x1 and y0 <= y < y1):
            n_out += 1
            continue
        cell = ((y - y0) // g) * cols + (x - x0) // g
        cells[cell] = cells.get(cell, 0) + 1
    n = sum(cells.values())
    sq = sum(v * v for v in cells.values())
    chi = None if n == 0 else (c_cnt * sq - n * n) * 10**6 // n
    vmr = (None if n == 0 or c_cnt < 2
           else (c_cnt * sq - n * n) * 10**6 // (n * (c_cnt - 1)))
    return (n, n_out, c_cnt, len(cells), chi, vmr)


def test_perfect_uniformity(spark):
    rows = [(0.5, 0.5), (1.5, 0.5), (0.5, 1.5), (1.5, 1.5)]
    got = _run(spark, rows)
    assert got == (4, 0, 4, 4, 0, 0)


def test_single_cell_cluster(spark):
    rows = [(0.5, 0.5)] * 4
    got = _run(spark, rows)
    # chi2 = (4·16 − 16)/4 = 12, vmr = 12/3 = 4
    assert got == (4, 0, 4, 1, 12_000_000, 4_000_000)
    assert got == _mirror(rows)


def test_half_open_boundaries(spark):
    # upper edges excluded, interior edge lands in the upper cell
    rows = [(2.0, 1.0), (1.0, 1.0), (0.0, 0.0)]
    got = _run(spark, rows)
    assert got[0] == 2 and got[1] == 1
    assert got == _mirror(rows)


def test_empty_cells_enter_via_c(spark):
    # same counts, bigger declared grid → bigger chi2
    rows = [(0.5, 0.5), (0.25, 0.25)]
    small = _run(spark, rows, bbox=(0.0, 0.0, 1.0, 1.0), res=1.0)
    big = _run(spark, rows, bbox=(0.0, 0.0, 4.0, 4.0), res=1.0)
    assert small[2] == 1 and big[2] == 16
    assert small[4] == 0          # single cell: no deviation
    assert big[4] > 0 and big[5] > 1_000_000
    assert big == _mirror(rows, bbox=(0.0, 0.0, 4.0, 4.0), res=1.0)


def test_validation(spark):
    with pytest.raises(ValueError, match="multiples"):
        _run(spark, [(0.1, 0.1)], bbox=(0.0, 0.0, 1.5, 2.0), res=1.0)
    with pytest.raises(ValueError, match="positive spans"):
        _run(spark, [(0.1, 0.1)], bbox=(1.0, 0.0, 0.0, 2.0), res=1.0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(2525)
    rows = [
        (rng.uniform(-1.0, 3.0), rng.uniform(-1.0, 3.0))
        for _ in range(300)
    ]
    got = _run(spark, rows, bbox=(0.0, 0.0, 2.0, 2.0), res=0.5)
    assert got == _mirror(rows, bbox=(0.0, 0.0, 2.0, 2.0), res=0.5)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(spatial.quadrat_test_sql(
        "t", (0.0, 0.0, 2.0, 2.0), 0.5
    )).fetchall()
    assert tuple(out[0]) == got

"""Spatial correlogram (spatial.morans_correlogram) — band-1 must
reproduce global morans_i exactly (queen ring ≡ Chebyshev ring 1),
planted smooth-blob decay, empty-band NULLs, Python mirror of the
truncating integer arithmetic, DuckDB twin parity."""

import random
from fractions import Fraction

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import spatial

COLS, ROWS = 1440, 720


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("correlogram-tests", master="local[4]",
                    shuffle_partitions=8)


def _canon(rows):
    return sorted(tuple("∅" if v is None else v for v in r) for r in rows)


def _py_correlogram(cells, max_band):
    n = len(cells)
    s = sum(cells.values())
    dev = {c: n * x - s for c, x in cells.items()}
    den = sum(d * d for d in dev.values())
    per = {}
    for (la, lo), d1 in ((k, dev[k]) for k in cells):
        for dy, dx, band in spatial._correlogram_offsets(max_band):
            tla = la + dy
            if not (0 <= tla < ROWS):
                continue
            tlo = (lo + dx + COLS) % COLS
            d2 = dev.get((tla, tlo))
            if d2 is None:
                continue
            w, num = per.get(band, (0, 0))
            per[band] = (w + 2, num + 2 * d1 * d2)
    out = []
    for band in range(1, max_band + 1):
        w, num = per.get(band, (0, None))
        if w == 0 or den == 0:
            ippm = None
        else:
            ippm = int(Fraction(n * num * 10**6, w * den))  # trunc
        out.append((band, n, w, num, den, ippm))
    return out


def _mk(rng, blob=True):
    cells = {}
    for _ in range(300):
        cells[(rng.randrange(300, 360), rng.randrange(700, 770))] = (
            rng.randrange(0, 10)
        )
    if blob:
        for la in range(330, 340):
            for lo in range(720, 730):
                cells[(la, lo)] = 40 + (la + lo) % 5
    return cells


def _spark_rows(cells):
    return [(la * COLS + lo, v) for (la, lo), v in cells.items()]


def test_band1_equals_global_morans_i(spark):
    cells = _mk(random.Random(4409))
    df = spark.createDataFrame(_spark_rows(cells), "cell bigint, n_pages bigint")
    band1 = {
        r.band: r for r in
        spatial.morans_correlogram(df, "n_pages", max_band=2).collect()
    }[1]
    gi = spatial.morans_i(df, "n_pages").collect()[0]
    assert (band1.n_cells, band1.w_sum, band1.num, band1.den,
            band1.i_ppm) == (gi.n_cells, gi.w_sum, gi.num, gi.den,
                             gi.i_ppm)


def test_planted_blob_decay(spark):
    cells = _mk(random.Random(4410), blob=True)
    df = spark.createDataFrame(_spark_rows(cells), "cell bigint, n_pages bigint")
    got = {
        r.band: r.i_ppm for r in
        spatial.morans_correlogram(df, "n_pages", max_band=3).collect()
    }
    # a 10×10 smooth blob: strong positive autocorrelation at every
    # tested ring, strongest at ring 1 (structural, not tuned — all
    # blob neighbors within ring 3 share the elevated 40+ values)
    assert got[1] > got[2] > 0
    assert got[1] > got[3] > 0


def test_empty_band_null(spark):
    # two isolated occupied cells, 10 rings apart: every band 1..3 empty
    rows = [(400 * COLS + 100, 5), (400 * COLS + 120, 9)]
    df = spark.createDataFrame(rows, "cell bigint, n_pages bigint")
    got = spatial.morans_correlogram(df, "n_pages", max_band=3).collect()
    for r in got:
        assert r.w_sum == 0 and r.i_ppm is None


def test_validation(spark):
    df = spark.createDataFrame([(0, 1)], "cell bigint, n_pages bigint")
    with pytest.raises(ValueError, match="max_band"):
        spatial.morans_correlogram(df, "n_pages", max_band=0)
    with pytest.raises(ValueError, match="grid columns"):
        spatial.morans_correlogram(df, "n_pages", max_band=3,
                                   res_deg=60.0)


def test_mirror_and_twin_random(spark):
    rng = random.Random(4411)
    cells = _mk(rng)
    rows = _spark_rows(cells)
    df = spark.createDataFrame(rows, "cell bigint, n_pages bigint")
    got = _canon(
        spatial.morans_correlogram(df, "n_pages", max_band=3).collect()
    )
    mirror = _canon(_py_correlogram(cells, 3))
    assert got == mirror
    con = duckdb.connect()
    con.register("r", con.from_df(pd.DataFrame(rows, columns=["cell", "n_pages"])))
    twin = _canon(con.execute(
        "WITH " + spatial.morans_correlogram_ctes("r", "n_pages", max_band=3)
    ).fetchall())
    assert got == twin

"""Areal interpolation (spatial.areal_interp) — planted exact
transfers, conservation property, half-open edge-touch semantics, the
fan-out guard, and DuckDB twin parity (naive O(n²) vs PBSM grid) on
random rectangle layers."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("areal-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 1_000_000  # 1° integer grid


def _run(spark, srcs, tgts, res=RES, max_cells=256):
    s = spark.createDataFrame(
        srcs, "src_id long, minx long, miny long, maxx long, maxy long,"
        " value long"
    )
    t = spark.createDataFrame(
        tgts, "tgt_id long, minx long, miny long, maxx long, maxy long"
    )
    rows = spatial.areal_interp(
        s, t, res, max_cells=max_cells
    ).collect()
    return {
        r["tgt_id"]: (r["n_src"], r["overlap_area"], r["est_value"])
        for r in rows
    }


def _python(srcs, tgts):
    out = {}
    for tid, tx0, ty0, tx1, ty1 in tgts:
        n = area = val = 0
        for sid, sx0, sy0, sx1, sy1, v in srcs:
            ix0, iy0 = max(sx0, tx0), max(sy0, ty0)
            ix1, iy1 = min(sx1, tx1), min(sy1, ty1)
            if ix0 < ix1 and iy0 < iy1:
                ia = (ix1 - ix0) * (iy1 - iy0)
                n += 1
                area += ia
                val += (v * ia) // ((sx1 - sx0) * (sy1 - sy0))
        out[tid] = (n, area, val)
    return out


def test_exact_quarter_split(spark):
    """A source square exactly quartered by four targets: each gets
    value/4, mass conserved exactly (no flooring loss at these
    divisors)."""
    M = 1_000_000
    srcs = [(1, 0, 0, 2 * M, 2 * M, 400)]
    tgts = [
        (1, 0, 0, M, M), (2, M, 0, 2 * M, M),
        (3, 0, M, M, 2 * M), (4, M, M, 2 * M, 2 * M),
    ]
    got = _run(spark, srcs, tgts)
    assert got == {i: (1, M * M, 100) for i in range(1, 5)}


def test_edge_touch_transfers_nothing(spark):
    """Rects sharing only an edge: zero area, zero transfer, and the
    target still reports a zero row (no silent drop)."""
    M = 1_000_000
    srcs = [(1, 0, 0, M, M, 50)]
    tgts = [(1, M, 0, 2 * M, M), (2, 5 * M, 5 * M, 6 * M, 6 * M)]
    got = _run(spark, srcs, tgts)
    assert got == {1: (0, 0, 0), 2: (0, 0, 0)}


def test_negative_coordinates_exact(spark):
    """Rects straddling the prime meridian / equator (negative µdeg):
    the pole shift keeps the grid floor-consistent."""
    M = 1_000_000
    srcs = [(1, -M, -M, M, M, 1000)]
    tgts = [(1, -M, -M, 0, 0), (2, 0, 0, M, M)]
    got = _run(spark, srcs, tgts)
    assert got[1] == (1, M * M, 250)
    assert got[2] == (1, M * M, 250)


def test_fanout_guard(spark):
    M = 1_000_000
    srcs = [(1, 0, 0, 40 * M, 40 * M, 10)]
    tgts = [(1, 0, 0, M, M)]
    with pytest.raises(Exception, match="max_cells"):
        _run(spark, srcs, tgts, max_cells=16)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(606)
    M = 1_000_000
    srcs, tgts = [], []
    for i in range(60):
        x0 = rng.randrange(-20 * M, 20 * M)
        y0 = rng.randrange(-10 * M, 10 * M)
        srcs.append((i, x0, y0,
                     x0 + rng.randrange(1, 3 * M),
                     y0 + rng.randrange(1, 3 * M),
                     rng.randrange(1, 10**6)))
    for j in range(40):
        x0 = rng.randrange(-20 * M, 20 * M)
        y0 = rng.randrange(-10 * M, 10 * M)
        tgts.append((j, x0, y0,
                     x0 + rng.randrange(1, 4 * M),
                     y0 + rng.randrange(1, 4 * M)))
    want = _python(srcs, tgts)
    assert _run(spark, srcs, tgts) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE s (src_id BIGINT, minx BIGINT, miny BIGINT,"
                " maxx BIGINT, maxy BIGINT, value BIGINT)")
    con.execute("CREATE TABLE t (tgt_id BIGINT, minx BIGINT, miny BIGINT,"
                " maxx BIGINT, maxy BIGINT)")
    con.executemany("INSERT INTO s VALUES (?,?,?,?,?,?)", srcs)
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", tgts)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            spatial.areal_interp_sql("s", "t")
        ).fetchall()
    }
    assert got == want

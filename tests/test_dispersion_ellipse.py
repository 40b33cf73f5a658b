"""Standard deviational ellipse (spatial.dispersion_ellipse) —
axis-aligned lines, circular symmetry, the ±45° NULL convention,
negative-bearing truncation, small-n NULLs, random ≡ Fraction
mirror ≡ twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ell-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "g string, lon double, lat double"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = spatial.dispersion_ellipse(df, "g").collect()
    return {r.g: (r.n, r.cx_q, r.cy_q, r.vxx, r.vyy, r.vxy,
                  r.tan2t_ppm, r.elong_ppm) for r in out}


def _mirror(rows, scale=10_000):
    def r2i(v):
        s = v * scale
        return int(s + 0.5) if s >= 0 else -int(-s + 0.5)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    groups = {}
    for g, lo, la in rows:
        groups.setdefault(g, []).append((r2i(lo), r2i(la)))
    out = {}
    for g, pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        qx = sum(x * x for x, _ in pts)
        qy = sum(y * y for _, y in pts)
        qxy = sum(x * y for x, y in pts)
        cxx = (n * qx - sx * sx) // n
        cyy = (n * qy - sy * sy) // n
        cxy = tdiv(n * qxy - sx * sy, n)
        if n < 3:
            t = e = None
        else:
            t = (None if cxx == cyy
                 else tdiv(2 * cxy * 10**6, cxx - cyy))
            e = (None if cxx + cyy == 0
                 else ((cxx - cyy) ** 2 + 4 * cxy * cxy) * 10**6
                 // (cxx + cyy) ** 2)
        out[g] = (n, tdiv(sx, n), tdiv(sy, n), cxx, cyy, cxy, t, e)
    return out


def test_horizontal_line(spark):
    rows = [("h", float(i), 2.0) for i in range(5)]
    got = _run(spark, rows)
    n, cx, cy, cxx, cyy, cxy, t, e = got["h"]
    assert (cyy, cxy) == (0, 0)
    assert t == 0          # major axis due east
    assert e == 1_000_000  # degenerate line
    assert got == _mirror(rows)


def test_square_is_circular(spark):
    rows = [("s", 0.0, 0.0), ("s", 1.0, 0.0),
            ("s", 0.0, 1.0), ("s", 1.0, 1.0)]
    got = _run(spark, rows)
    _, _, _, cxx, cyy, cxy, t, e = got["s"]
    assert cxx == cyy and cxy == 0
    assert t is None       # no unique bearing
    assert e == 0          # perfect circle
    assert got == _mirror(rows)


def test_diagonal_line_null_tan_sign_in_cxy(spark):
    rows = [("d", float(i), float(i)) for i in range(4)]
    got = _run(spark, rows)
    _, _, _, cxx, cyy, cxy, t, e = got["d"]
    assert cxx == cyy and cxy > 0   # θ = +45° read from sign(Cxy)
    assert t is None
    assert e == 1_000_000
    anti = [("a", float(i), -float(i)) for i in range(4)]
    ga = _run(spark, anti)["a"]
    assert ga[5] < 0 and ga[6] is None and ga[7] == 1_000_000


def test_negative_bearing_truncation(spark):
    # elongated along x with a slight negative tilt: Cxy < 0,
    # Cxx > Cyy → tan2t negative, trunc toward zero both engines
    rows = [("t", 0.0, 0.0), ("t", 2.0, -0.1),
            ("t", 4.0, -0.2), ("t", 6.0, -0.35)]
    got = _run(spark, rows)
    assert got["t"][6] < 0
    assert got == _mirror(rows)


def test_small_n_null(spark):
    rows = [("p", 1.0, 2.0), ("p", 3.0, 4.0)]
    got = _run(spark, rows)
    assert got["p"][6] is None and got["p"][7] is None


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(8787)
    rows = []
    for g in range(12):
        n = rng.randrange(3, 30)
        cx, cy = rng.uniform(-50, 50), rng.uniform(-40, 40)
        sx, sy = rng.uniform(0.1, 3), rng.uniform(0.1, 3)
        rows += [
            (f"g{g}", cx + rng.uniform(-sx, sx),
             cy + rng.uniform(-sy, sy))
            for _ in range(n)
        ]
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(
        spatial.dispersion_ellipse_sql("t", "g")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

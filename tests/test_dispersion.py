"""Centrographics (spatial.point_dispersion) — hand-placed clusters,
zero dispersion for coincident points, negative-coordinate centers,
the N-scaling identity vs a Fraction mirror, twin parity."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("disp-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "g string, lon double, lat double"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = spatial.point_dispersion(df, "g").collect()
    return {r.g: (r.n, r.cx_q, r.cy_q, r.disp2_q) for r in out}


def _mirror(rows, scale=10_000):
    import math

    def r2i(v):
        s = v * scale
        return int(math.floor(s + 0.5)) if s >= 0 \
            else -int(math.floor(-s + 0.5))

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

        def tdiv(a, b):
            q = abs(a) // b
            return -q if a < 0 else q

        disp2 = ((n * qx - sx * sx) + (n * qy - sy * sy)) // (n * n)
        out[g] = (n, tdiv(sx, n), tdiv(sy, n), disp2)
    return out


def test_coincident_zero(spark):
    rows = [("a", 3.5, -2.25)] * 4
    got = _run(spark, rows)
    assert got == {"a": (4, 35000, -22500, 0)}


def test_square_dispersion(spark):
    # 4 corners of a 2×2 square centered at origin: every point is
    # (±1, ±1) → mean sq distance = 2 deg² = 2·10⁸ units²
    rows = [("a", 1.0, 1.0), ("a", 1.0, -1.0),
            ("a", -1.0, 1.0), ("a", -1.0, -1.0)]
    got = _run(spark, rows)
    assert got == {"a": (4, 0, 0, 2 * 10_000 ** 2)}


def test_negative_center_truncation(spark):
    # Sx = -3·10⁴·(0+1) + ... craft: points at -1.0 and 0.5 →
    # Sx = -5000, n=2 → cx = -2500 (trunc toward zero, both engines)
    rows = [("a", -1.0, 0.0), ("a", 0.5, 0.0)]
    got = _run(spark, rows)
    assert got["a"][1] == -2500


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(111)
    rows = [
        (rng.choice(["a", "b", "c"]),
         rng.uniform(-180, 180), rng.uniform(-90, 90))
        for _ in range(300)
    ]
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(
        spatial.point_dispersion_sql("t", "g")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

"""Knox space–time interaction (spatial.knox_test) — hand-counted
pair sets, interaction vs independence ratios, boundary inclusivity,
the loud bucket guard survives column pruning, random ≡ brute-force
mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("knox-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "doc_id long, lon double, lat double, t long"


def _run(spark, rows, delta=0.25, tau=100, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = spatial.knox_test(df, delta, tau, **kw).collect()
    assert len(out) == 1
    r = out[0]
    return (r.n, r.n_pairs, r.ns, r.nt, r.x_obs, r.exp_x_ppm,
            r.ratio_ppm)


def _mirror(rows, delta=0.25, tau=100, scale=10_000):
    def q(v, off):
        s = v * scale
        return (int(s + 0.5) if s >= 0 else -int(-s + 0.5)) + off

    pts = [(i, q(lo, 180 * scale), q(la, 90 * scale), t)
           for i, lo, la, t in rows]
    d2max = int(round(delta * scale)) ** 2
    n = len(pts)
    ns = nt = x = 0
    for a in range(n):
        for b in range(a + 1, n):
            ia, xa, ya, ta = pts[a]
            ib, xb, yb, tb = pts[b]
            s = (xa - xb) ** 2 + (ya - yb) ** 2 <= d2max
            tt = abs(ta - tb) <= tau
            ns += s
            nt += tt
            x += s and tt
    p = n * (n - 1) // 2
    exp = None if n < 2 else (ns * nt * 10**6) // p
    ratio = None if ns == 0 or nt == 0 else (x * p * 10**6) // (ns * nt)
    return (n, p, ns, nt, x, exp, ratio)


def test_hand_counted(spark):
    # A-B close in space+time, A-C close in time only, B-C neither
    rows = [
        (1, 0.0, 0.0, 1000),
        (2, 0.1, 0.0, 1050),
        (3, 5.0, 5.0, 1080),
    ]
    got = _run(spark, rows)
    # pairs: (1,2) s+t, (1,3) t, (2,3) t → ns=1, nt=3, x=1
    assert got == (3, 3, 1, 3, 1, 1_000_000, 1_000_000)
    assert got == _mirror(rows)


def test_interaction_ratio_above_one(spark):
    # two tight space-time clusters far apart: every same-cluster
    # pair is close in both, cross pairs in neither → x = ns = nt
    rows = [
        (1, 0.0, 0.0, 0), (2, 0.01, 0.0, 10), (3, 0.0, 0.01, 20),
        (4, 50.0, 50.0, 10**6), (5, 50.01, 50.0, 10**6 + 10),
    ]
    got = _run(spark, rows)
    n, p, ns, nt, x, exp, ratio = got
    assert (ns, nt, x) == (4, 4, 4)
    assert ratio == (x * p * 10**6) // (ns * nt) == 2_500_000
    assert got == _mirror(rows)


def test_boundaries_inclusive(spark):
    # d = exactly delta and |dt| = exactly tau both count
    rows = [(1, 0.0, 0.0, 0), (2, 0.25, 0.0, 100)]
    got = _run(spark, rows)
    assert (got[2], got[3], got[4]) == (1, 1, 1)
    rows_out = [(1, 0.0, 0.0, 0), (2, 0.2501, 0.0, 101)]
    got2 = _run(spark, rows_out)
    assert (got2[2], got2[3], got2[4]) == (0, 0, 0)
    assert got2[6] is None


def test_bucket_guard_fires(spark):
    rows = [(i, 0.0, 0.0, 0) for i in range(5)]
    with pytest.raises(Exception, match="max_bucket"):
        _run(spark, rows, max_bucket=3)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(1414)
    rows = [
        (i, rng.randrange(-20, 21) * 0.0625,
         rng.randrange(-20, 21) * 0.0625,
         rng.randrange(0, 2000))
        for i in range(120)
    ]
    got = _run(spark, rows, delta=0.25, tau=150)
    assert got == _mirror(rows, delta=0.25, tau=150)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, lon DOUBLE, "
                "lat DOUBLE, t BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    out = con.execute(spatial.knox_test_sql(
        "t", 0.25, 150
    )).fetchall()
    assert tuple(out[0]) == got

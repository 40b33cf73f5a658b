"""Exact-integer Spearman rho (ranking.spearman_rho) — planted
monotone / reversed / tied series with closed-form rho, a
fractions-based Python mirror on random data (isqrt exactness), and
DuckDB twin parity."""

import math
import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import ranking

M = 1_000_000


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("spearman-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, k=256):
    df = spark.createDataFrame(
        rows, "g string, x bigint, y bigint, key bigint"
    )
    out = ranking.spearman_rho(df, "g", "x", "y", "key", k=k).collect()
    return {r.g: (r.n_sample, r.rho_ppm) for r in out}


def _python_mirror(rows, k_unused=None):
    """Doubled-average-rank Spearman in exact rationals + isqrt —
    assumes every group is within the sample cap."""
    by_g = {}
    for g, x, y, _ in rows:
        by_g.setdefault(g, []).append((x, y))
    out = {}
    for g, pts in by_g.items():
        n = len(pts)

        def dranks(vals):
            order = sorted(range(n), key=lambda i: vals[i])
            r = [0] * n
            i = 0
            while i < n:
                j = i
                while j < n and vals[order[j]] == vals[order[i]]:
                    j += 1
                # doubled average rank of the tie block [i, j)
                dr = (i + 1) + j
                for t in range(i, j):
                    r[order[t]] = dr
                i = j
            return r

        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        rx, ry = dranks(xs), dranks(ys)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        if n < 2 or dx == 0 or dy == 0:
            out[g] = (n, None)
            continue
        q = (num * num * 10**12) // (dx * dy)
        s = math.isqrt(q)
        out[g] = (n, -s if num < 0 else s)
    return out


def test_perfect_monotone(spark):
    rows = [("a", i, i * 100 + 7, i) for i in range(20)]
    got = _run(spark, rows)
    assert got["a"] == (20, M)


def test_perfect_reversed(spark):
    rows = [("a", i, -i, i) for i in range(15)]
    got = _run(spark, rows)
    assert got["a"] == (15, -M)


def test_constant_axis_null(spark):
    rows = [("a", i, 5, i) for i in range(10)]
    got = _run(spark, rows)
    assert got["a"] == (10, None)


def test_singleton_null(spark):
    got = _run(spark, [("a", 1, 2, 1)])
    assert got["a"] == (1, None)


def test_classic_small_example(spark):
    """n=5, one displaced point — closed form 1 − 6·Σd²/(n(n²−1)):
    d = (0,0,0,1,−1) → rho = 1 − 12/120 = 0.9 exactly."""
    xs = [1, 2, 3, 4, 5]
    ys = [10, 20, 30, 50, 40]
    rows = [("a", x, y, i) for i, (x, y) in enumerate(zip(xs, ys))]
    got = _run(spark, rows)
    assert got["a"] == (5, 900_000)


def test_ties_average_ranks(spark):
    """Tied x block takes the average rank on both engines — mirror
    agrees with the exact-rational computation."""
    rows = [
        ("a", 1, 10, 0), ("a", 1, 20, 1), ("a", 1, 30, 2),
        ("a", 2, 25, 3), ("a", 3, 40, 4), ("a", 3, 35, 5),
    ]
    got = _run(spark, rows)
    want = _python_mirror(rows)
    assert got == want


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(13)
    rows = []
    for gi, g in enumerate(["g0", "g1", "g2"]):
        for i in range(60):
            x = rng.randrange(0, 30)        # plenty of ties
            noise = rng.randrange(-8, 9)
            y = x * (gi + 1) + noise if gi < 2 else -x * 2 + noise
            rows.append((g, x, y, gi * 1000 + i))
    got = _run(spark, rows)
    want = _python_mirror(rows)
    assert got == want
    # planted sign structure
    assert got["g0"][1] > 700_000
    assert got["g2"][1] < -700_000

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(g VARCHAR, x BIGINT, y BIGINT, key BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    got_sql = {
        g: (n, r)
        for g, n, r in con.execute(
            ranking.spearman_rho_sql("t", "g", "x", "y", "key", k=256)
        ).fetchall()
    }
    assert got == got_sql


def test_sample_cap_applies_consistently(spark):
    """Above the cap both engines grade the SAME bottom-k subset —
    Spark and DuckDB agree at k=8 on a 40-row group."""
    rng = random.Random(4)
    rows = [("a", rng.randrange(100), rng.randrange(100), i)
            for i in range(40)]
    got = _run(spark, rows, k=8)
    assert got["a"][0] == 8
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(g VARCHAR, x BIGINT, y BIGINT, key BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    got_sql = {
        g: (n, r)
        for g, n, r in con.execute(
            ranking.spearman_rho_sql("t", "g", "x", "y", "key", k=8)
        ).fetchall()
    }
    assert got == got_sql


def test_k_validated(spark):
    with pytest.raises(ValueError):
        ranking.spearman_rho_sql("t", "g", "x", "y", "key", k=2048)

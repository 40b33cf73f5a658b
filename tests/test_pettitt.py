"""Pettitt rank change-point (temporal.pettitt_split) — planted step
shifts, outlier robustness vs CUSUM, O(n²) pairwise mirror vs the
histogram identity, earliest-tie argmax, twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("pettitt-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    out = temporal.pettitt_split(df, "k", "t", "y").collect()
    return {
        r.k: (r.n, r.split_k, r.split_t, r.u_abs, r.u_signed)
        for r in out
    }


def _sgn(x):
    return (x > 0) - (x < 0)


def _python_mirror(rows):
    """Direct O(n²) pairwise U_t — independent of the operator's
    histogram identity."""
    series = {}
    for k, t, y in rows:
        series.setdefault(k, []).append((t, y))
    out = {}
    for k, pts in series.items():
        pts.sort()
        n = len(pts)
        if n < 2:
            continue
        best = None
        for ti in range(1, n):
            u = sum(
                _sgn(pts[j][1] - pts[i][1])
                for i in range(ti)
                for j in range(ti, n)
            )
            cand = (abs(u), -ti)
            if best is None or cand > best[0]:
                best = (cand, ti, pts[ti - 1][0], u)
        _, i, t, u = best
        out[k] = (n, i, t, abs(u), u)
    return out


def test_clean_step_shift(spark):
    """0s then 10s: the split lands exactly at the boundary with the
    maximal U = k·(n−k)."""
    rows = [("a", t, 0) for t in range(6)] + [
        ("a", t, 10) for t in range(6, 15)
    ]
    got = _run(spark, rows)
    assert got["a"] == (15, 6, 5, 6 * 9, 6 * 9)
    assert got == _python_mirror(rows)


def test_outlier_does_not_claim_split(spark):
    """Flat series with one monster spike: CUSUM's mean shift points
    at the spike; Pettitt's rank statistic stays tiny (the spike is
    ONE discordant rank) — assert u_abs is far below the clean-step
    maximum AND matches the pairwise mirror."""
    rows = [("a", t, 50) for t in range(20)]
    rows[7] = ("a", 7, 10**9)
    got = _run(spark, rows)
    assert got == _python_mirror(rows)
    assert got["a"][3] <= 19  # one rank's worth, not k*(n-k)=~100


def test_decreasing_shift_negative_u(spark):
    rows = [("a", t, 100) for t in range(5)] + [
        ("a", t, 1) for t in range(5, 10)
    ]
    got = _run(spark, rows)
    assert got["a"][4] == -25 and got["a"][1] == 5
    assert got == _python_mirror(rows)


def test_earliest_tie_argmax(spark):
    """Symmetric W shape can tie |U| at two prefixes: earliest wins
    (mirror uses the same (|U|, −t) order)."""
    rows = [("a", t, y) for t, y in enumerate([0, 5, 0, 5, 0, 5])]
    got = _run(spark, rows)
    assert got == _python_mirror(rows)


def test_single_point_absent(spark):
    got = _run(spark, [("solo", 1, 3)])
    assert "solo" not in got


def test_duplicate_order_raises(spark):
    with pytest.raises(Exception, match="duplicate"):
        _run(spark, [("a", 1, 1), ("a", 1, 2), ("a", 2, 3)])


def test_random_matches_mirror_and_duckdb(spark):
    rng = random.Random(53)
    rows = []
    for k in ("shift", "noise", "ties"):
        n = rng.randrange(10, 30)
        for t in range(n):
            if k == "shift":
                y = rng.randrange(0, 10) + (100 if t > n // 3 else 0)
            elif k == "ties":
                y = rng.randrange(0, 3)
            else:
                y = rng.randrange(0, 1000)
            rows.append((k, t, y))
    got = _run(spark, rows)
    assert got == _python_mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, t BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql_rows = con.execute(
        temporal.pettitt_split_sql("t", "k", "t", "y")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in sql_rows} == got
    assert got["shift"][1] == len(
        [r for r in rows if r[0] == "shift"]
    ) // 3 + 1

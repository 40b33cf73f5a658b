"""Lag-scan cross-correlation (temporal.series_crosscorr) — planted
lead/lag recovered at the right lag, sign behavior, constant-series
NULL, duplicate-position guard, Fraction mirror ≡ twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("xcorr-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "k string, pos long, x long, y long"
LAGS = (-2, -1, 0, 1, 2)


def _run(spark, rows, lags=LAGS):
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.series_crosscorr(df, "k", "pos", "x", "y",
                                    lags=lags).collect()
    return {(r.k, r.lag): (r.n, r.n_pairs, r.num, r.xcf2_ppm)
            for r in out}


def _mirror(rows, lags=LAGS):
    from collections import defaultdict

    series = defaultdict(dict)
    for k, pos, x, y in rows:
        series[k][pos] = (x, y)
    out = {}
    for k, pts in series.items():
        order = sorted(pts)
        xs = [pts[p][0] for p in order]
        ys = [pts[p][1] for p in order]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        dx = [n * v - sx for v in xs]
        dy = [n * v - sy for v in ys]
        denx = sum(d * d for d in dx)
        deny = sum(d * d for d in dy)
        for lag in lags:
            ps = [
                (dx[t], dy[t + lag]) for t in range(n)
                if 0 <= t + lag < n
            ]
            num = sum(a * b for a, b in ps)
            if denx == 0 or deny == 0 or not ps:
                sc = None
            else:
                a = abs(num) * 10**6 // denx
                b = abs(num) * 10**6 // deny
                sc = (-1 if num < 0 else 1) * (a * b // 10**6)
            out[(k, lag)] = (n, len(ps), num, sc)
    return out


def test_planted_lead_recovered(spark):
    # y is x shifted forward by 2 positions: y_{t+2} = x_t → the
    # lag-(+2) score dominates and is near 10⁶
    base = [5, 9, 1, 7, 3, 8, 2, 6, 4, 9, 1, 5]
    rows = []
    for t in range(10):
        rows.append(("g", t, base[t], base[t - 2] if t >= 2 else 0))
    got = _run(spark, rows)
    scores = {lag: got[("g", lag)][3] for lag in LAGS}
    best = max((v for v in scores.values() if v is not None))
    assert scores[2] == best and best > 300_000


def test_sign_anticorrelation(spark):
    rows = [("g", t, v, 10 - v) for t, v in enumerate([1, 9, 2, 8, 3])]
    got = _run(spark, rows)
    assert got[("g", 0)][3] == -1_000_000


def test_perfect_positive_at_zero(spark):
    rows = [("g", t, v, 3 * v + 7) for t, v in enumerate([4, 1, 8, 2])]
    got = _run(spark, rows)
    # affine relation → |r| = 1 exactly (staged floor may shave ppm)
    assert got[("g", 0)][3] >= 999_998


def test_constant_series_null(spark):
    rows = [("g", t, 5, t) for t in range(4)]
    got = _run(spark, rows)
    assert all(v[3] is None for v in got.values())


def test_duplicate_pos_raises(spark):
    rows = [("g", 1, 1, 1), ("g", 1, 2, 2)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(Exception, match="duplicate order"):
        temporal.series_crosscorr(df, "k", "pos", "x", "y").collect()


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(404)
    rows = []
    for k in ("a", "b", "c"):
        for t in range(40):
            rows.append((k, t, rng.randrange(0, 50),
                         rng.randrange(0, 50)))
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, pos BIGINT, x BIGINT, "
                "y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    out = con.execute(temporal.series_crosscorr_sql(
        "t", "k", "pos", "x", "y", lags=LAGS
    )).fetchall()
    assert {(r[0], r[1]): tuple(r[2:]) for r in out} == got

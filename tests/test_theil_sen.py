"""Theil–Sen robust fit (temporal.theil_sen) — closed-form planted
lines, outlier immunity vs the data's own OLS, truncating-division
sign cases, loud guards, Python trunc-median mirror + twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("theilsen-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    out = temporal.theil_sen(df, "k", "t", "y", **kw).collect()
    return {
        r.k: (r.n_pts, r.n_pairs, r.slope_ppm, r.intercept_ppm)
        for r in out
    }


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _python_mirror(rows):
    series = {}
    for k, t, y in rows:
        series.setdefault(k, []).append((t, y))
    out = {}
    for k, pts in series.items():
        pts.sort()
        n = len(pts)
        slopes = sorted(
            (
                _trunc_div((yb - ya) * 10**6, tb - ta),
                ta,
                tb,
            )
            for i, (ta, ya) in enumerate(pts)
            for tb, yb in pts[i + 1:]
        )
        npair = len(slopes)
        if npair == 0:
            out[k] = (n, 0, None, None)
            continue
        slope = slopes[(npair + 1) // 2 - 1][0]
        bs = sorted(
            (y * 10**6 - slope * t, t) for t, y in pts
        )
        icept = bs[(n + 1) // 2 - 1][0]
        out[k] = (n, npair, slope, icept)
    return out


def test_exact_line_recovered(spark):
    """y = 3t + 7: every pairwise slope is 3, intercept exactly 7."""
    rows = [("a", t, 3 * t + 7) for t in range(10)]
    got = _run(spark, rows)
    assert got["a"] == (10, 45, 3_000_000, 7_000_000)


def test_outlier_immunity(spark):
    """One wild spike leaves the slope at 2 ppm-exact — the estimator
    the operator exists for; OLS over the same data does not."""
    rows = [("a", t, 2 * t) for t in range(11)]
    rows[10] = ("a", 10, 1_000_000)
    got = _run(spark, rows)
    assert got["a"][2] == 2_000_000
    # the spike drags OLS far off 2:
    n = len(rows)
    sx = sum(t for _, t, _ in rows)
    sy = sum(y for _, _, y in rows)
    sxx = sum(t * t for _, t, _ in rows)
    sxy = sum(t * y for _, t, y in rows)
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(ols - 2) > 100


def test_negative_slope_truncation(spark):
    """Falling line with non-integer pairwise slopes: DIV truncates
    toward zero in both engines (−3/2 → −1, not −2)."""
    rows = [("a", 0, 3), ("a", 2, 0)]
    got = _run(spark, rows)
    assert got["a"] == (2, 1, -1_500_000, 3_000_000)
    rows2 = [("b", 0, 0), ("b", 3, -7)]
    got2 = _run(spark, rows2)
    # -7/3 = -2.33… → trunc -2333333 (floor would give -2333334)
    assert got2["b"][2] == -2_333_333


def test_single_point_nulls(spark):
    got = _run(spark, [("solo", 5, 42)])
    assert got["solo"] == (1, 0, None, None)


def test_guards_fire(spark):
    pdf = [("a", t, t) for t in range(5)]
    with pytest.raises(Exception, match="max_points"):
        _run(spark, pdf, max_points=3)
    with pytest.raises(Exception, match="duplicate"):
        _run(spark, [("a", 1, 1), ("a", 1, 2)])
    with pytest.raises(ValueError, match="max_points"):
        temporal.theil_sen(
            spark.createDataFrame(pdf, "k string, t bigint, y bigint"),
            "k", "t", "y", max_points=1,
        )


def test_random_matches_mirror_and_duckdb(spark):
    rng = random.Random(41)
    rows = []
    for k, (slope, n) in {
        "up": (5, 12), "down": (-3, 9), "flat": (0, 7), "pair": (1, 2),
    }.items():
        ts = rng.sample(range(100), n)
        rows += [
            (k, t, slope * t + rng.randrange(-20, 21)) for t in ts
        ]
    got = _run(spark, rows)
    assert got == _python_mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, t BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql_rows = con.execute(
        temporal.theil_sen_sql("t", "k", "t", "y")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in sql_rows} == got
    assert got["up"][2] > 4_000_000 and got["down"][2] < -2_000_000

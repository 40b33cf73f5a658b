"""Exact OLS trend (temporal.ols_fit) — hand-computed lines, negative
slope sign decomposition, degenerate D/Dy cases, random ≡ exact
Fraction mirror ≡ DuckDB twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ols-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, pts):
    df = spark.createDataFrame(
        [(k, t, y) for k, t, y in pts], "k string, t long, y long"
    )
    out = temporal.ols_fit(df, "k", "t", "y").collect()
    return {
        r.k: (r.n, r.t0, r.slope_ppm, r.intercept_ppm, r.r2_ppm)
        for r in out
    }


def _trunc_ppm(fr):
    num = fr.numerator * 1_000_000
    den = fr.denominator
    q = abs(num) // den
    return -q if num < 0 else q


def _mirror(pts):
    byk = {}
    for k, t, y in pts:
        byk.setdefault(k, []).append((t, y))
    out = {}
    for k, rows in byk.items():
        n = len(rows)
        m = min(t for t, _ in rows)
        s = [(t - m, y) for t, y in rows]
        st = sum(t for t, _ in s)
        sy = sum(y for _, y in s)
        stt = sum(t * t for t, _ in s)
        sty = sum(t * y for t, y in s)
        syy = sum(y * y for _, y in s)
        d = n * stt - st * st
        nm = n * sty - st * sy
        dy = n * syy - sy * sy
        if d == 0:
            out[k] = (n, m, None, None, None)
            continue
        slope = _trunc_ppm(Fraction(nm, d))
        inter = _trunc_ppm(Fraction(sy * stt - st * sty, d))
        r2 = (None if dy == 0
              else _trunc_ppm(Fraction(nm * nm, d * dy)))
        out[k] = (n, m, slope, inter, r2)
    return out


def test_perfect_line(spark):
    # y = 3t + 7 over t = 100..104 → slope 3·10⁶, intercept at
    # t0=100 is y(100)=307 → 307·10⁶, R² = exactly 10⁶
    pts = [("a", 100 + i, 3 * (100 + i) + 7) for i in range(5)]
    got = _run(spark, pts)
    assert got == {"a": (5, 100, 3_000_000, 307_000_000, 1_000_000)}


def test_negative_slope_trunc_toward_zero(spark):
    # y = −t over t=0..2 with one bump: slopes stay negative; check
    # exact mirror equality (sign decomposition on both engines)
    pts = [("a", 0, 10), ("a", 1, 8), ("a", 2, 7)]
    got = _run(spark, pts)
    assert got == _mirror(pts)
    assert got["a"][2] == -1_500_000  # slope −3/2 exactly


def test_single_point_and_equal_t_null(spark):
    pts = [("one", 5, 9), ("eq", 3, 1), ("eq", 3, 5)]
    got = _run(spark, pts)
    assert got["one"] == (1, 5, None, None, None)
    assert got["eq"] == (2, 3, None, None, None)


def test_constant_y_slope_zero_r2_null(spark):
    pts = [("c", t, 42) for t in range(4)]
    got = _run(spark, pts)
    assert got["c"] == (4, 0, 0, 42_000_000, None)


def test_epoch_hour_magnitude_rebase(spark):
    # raw epoch-hour t (~5·10⁵) with the algebraic rebase: exact
    # equality with the rebased-first mirror proves no overflow bite
    base = 493_000
    pts = [("h", base + i, 100 + 7 * i + (i % 3)) for i in range(50)]
    got = _run(spark, pts)
    assert got == _mirror(pts)
    assert got["h"][1] == base


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(417)
    pts = []
    for k in range(12):
        n = rng.randrange(1, 40)
        t0 = rng.randrange(0, 500_000)
        for i in range(n):
            pts.append(
                (f"k{k}", t0 + rng.randrange(0, 2000),
                 rng.randrange(-50, 500))
            )
    got = _run(spark, pts)
    assert got == _mirror(pts)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, t BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", pts)
    rows = con.execute(
        temporal.ols_fit_sql("t", "k", "t", "y")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got


def test_single_aggregation_plan(spark):
    """ONE hash-aggregate pair (partial+final) on the key — no window,
    no join, no second exchange."""
    pts = [("a", i, i) for i in range(10)]
    df = spark.createDataFrame(pts, "k string, t long, y long")
    plan = temporal.ols_fit(df, "k", "t", "y")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Join" not in plan

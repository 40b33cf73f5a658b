"""Holt double-exponential smoothing (temporal.holt_smoothing) —
closed-form linear-trend tracking, trend-aware vs EWMA residual
behavior, negative-value truncation semantics, Python mirror + DuckDB
recursive-CTE twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal

SH = temporal.HOLT_SCALE_SHIFT


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("holt-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, t bigint, x bigint")
    out = temporal.holt_smoothing(df, "g", "t", "x", **kw).collect()
    return {
        (r.g, r.t): (r.x_q, r.level_q, r.trend_q, r.resid_q)
        for r in out
    }


def _trunc(num, den):
    return -((-num) // den) if num < 0 else num // den


def _python_mirror(rows, alpha=(1, 4), beta=(1, 8)):
    a1, a2 = alpha
    b1, b2 = beta
    by_g = {}
    for g, t, x in rows:
        by_g.setdefault(g, []).append((t, int(x) << SH))
    out = {}
    for g, pts in by_g.items():
        pts.sort()
        lv = tr = None
        for t, xq in pts:
            if t == 0:
                lv, tr, resid = xq, 0, 0
            else:
                fc = lv + tr
                resid = xq - fc
                nl = _trunc(a1 * xq + (a2 - a1) * fc, a2)
                tr = _trunc(b1 * (nl - lv) + (b2 - b1) * tr, b2)
                lv = nl
            out[(g, t)] = (xq, lv, tr, resid)
    return out


def test_constant_series_is_fixed_point(spark):
    """A flat series: level = x, trend = 0, residual = 0 forever."""
    rows = [("a", t, 100) for t in range(8)]
    got = _run(spark, rows)
    for t in range(8):
        assert got[("a", t)] == (100 << SH, 100 << SH, 0, 0)


def test_linear_ramp_residual_shrinks(spark):
    """On x_t = 10t the one-step residual decays as the trend term
    learns the slope — the trend-awareness EWMA lacks."""
    rows = [("a", t, 10 * t) for t in range(30)]
    got = _run(spark, rows)
    early = abs(got[("a", 2)][3])
    late = abs(got[("a", 29)][3])
    assert late < early // 4
    # trend converges toward 10 per step (fixed-point)
    assert abs(got[("a", 29)][2] - (10 << SH)) < (10 << SH) // 3


def test_level_shift_spikes_residual_once(spark):
    """A step change produces one large residual, then re-converges."""
    rows = [("a", t, 50 if t < 10 else 150) for t in range(25)]
    got = _run(spark, rows)
    spike = got[("a", 10)][3]
    assert spike == (150 - 50) << SH
    assert abs(got[("a", 24)][3]) < spike // 5


def test_negative_values_truncation_matches_twin(spark):
    rows = [("a", t, v) for t, v in
            enumerate([-5, -17, 3, -40, 22, -1, -1, 8])]
    got = _run(spark, rows)
    want = _python_mirror(rows)
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE s(g VARCHAR, t BIGINT, x BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
    got_sql = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(
            temporal.holt_smoothing_sql("s", "g", "t", "x")
        ).fetchall()
    }
    assert got == got_sql


def test_random_multigroup_matches_python_and_duckdb(spark):
    rng = random.Random(12)
    rows = []
    for g in ["g0", "g1", "g2"]:
        n = rng.randrange(10, 40)
        base = rng.randrange(-100, 100)
        rows += [
            (g, t, base + rng.randrange(-30, 30) + 3 * t)
            for t in range(n)
        ]
    got = _run(spark, rows, alpha=(2, 5), beta=(1, 3))
    want = _python_mirror(rows, alpha=(2, 5), beta=(1, 3))
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE s(g VARCHAR, t BIGINT, x BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
    got_sql = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(
            temporal.holt_smoothing_sql(
                "s", "g", "t", "x", alpha=(2, 5), beta=(1, 3)
            )
        ).fetchall()
    }
    assert got == got_sql


def test_params_validated(spark):
    with pytest.raises(ValueError):
        temporal.holt_smoothing_sql("s", "g", "t", "x", alpha=(5, 4))

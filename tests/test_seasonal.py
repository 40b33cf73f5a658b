"""Classical additive decomposition (temporal.seasonal_decompose) —
planted trend+season+spike recovery, even/odd periods, edge NULLs,
regularity guard, Python trunc mirror + DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("seasonal-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, period=24):
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    out = temporal.seasonal_decompose(
        df, "k", "t", "y", period=period
    ).collect()
    return {
        (r.k, r.t): (r.phase, r.y, r.trend_ppm, r.seasonal_ppm,
                     r.remainder_ppm)
        for r in out
    }


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _python_mirror(rows, period):
    p, h = period, period // 2
    series = {}
    for k, t, y in rows:
        series.setdefault(k, {})[t] = y
    out = {}
    for k, by_t in series.items():
        ts = sorted(by_t)
        tr2p = {}
        for t in ts:
            if p % 2 == 0:
                if t - h in by_t and t + h in by_t:
                    tr2p[t] = (
                        by_t[t - h]
                        + 2 * sum(by_t[u] for u in range(
                            t - h + 1, t + h))
                        + by_t[t + h]
                    )
            else:
                if t - h in by_t and t + h in by_t:
                    tr2p[t] = 2 * sum(
                        by_t[u] for u in range(t - h, t + h + 1)
                    )
        det = {t: 2 * p * by_t[t] - tr2p[t] for t in tr2p}
        sums, cnts = {}, {}
        for t, d in det.items():
            ph = t % p
            sums[ph] = sums.get(ph, 0) + d
            cnts[ph] = cnts.get(ph, 0) + 1
        sraw = {
            ph: _tdiv(sums[ph] * 10**6, 2 * p * cnts[ph])
            for ph in sums
        }
        if sraw:
            adj = _tdiv(sum(sraw.values()), len(sraw))
            seas = {ph: v - adj for ph, v in sraw.items()}
        else:
            seas = {}
        for t in ts:
            ph = t % p
            tp = (
                _tdiv(tr2p[t] * 10**6, 2 * p) if t in tr2p else None
            )
            rem = (
                by_t[t] * 10**6 - tp - seas.get(ph, 0)
                if tp is not None
                else None
            )
            out[(k, t)] = (ph, by_t[t], tp, seas.get(ph), rem)
    return out


SEASON8 = [0, 30, 60, 40, 0, -20, -40, -70]  # sums to 0


def test_planted_trend_and_season(spark):
    """y = 5t + season(t mod 8): the 2×8 MA wipes a zero-sum season
    exactly, so trend_ppm = 5t·10⁶ on interior rows, seasonal_ppm
    recovers the planted shape, remainder is 0."""
    rows = [
        ("a", t, 5 * t + SEASON8[t % 8]) for t in range(40)
    ]
    got = _run(spark, rows, period=8)
    for t in range(4, 36):
        ph, y, tp, sp, rem = got[("a", t)]
        assert tp == 5 * t * 10**6, (t, tp)
        assert sp == SEASON8[t % 8] * 10**6
        assert rem == 0
    assert got[("a", 0)][2] is None and got[("a", 39)][2] is None
    assert got == _python_mirror(rows, 8)


def test_spike_lands_in_remainder(spark):
    """A one-hour spike shows up in ITS OWN remainder (diluted only
    by the MA smear and its phase mean) — the anomaly axis."""
    rows = [("a", t, 100 + SEASON8[t % 8]) for t in range(48)]
    rows[20] = ("a", 20, rows[20][2] + 800)
    got = _run(spark, rows, period=8)
    rems = {
        t: got[("a", t)][4]
        for t in range(4, 44)
        if got[("a", t)][4] is not None
    }
    assert max(rems, key=lambda t: abs(rems[t])) == 20
    assert rems[20] > 500 * 10**6
    assert got == _python_mirror(rows, 8)


def test_odd_period(spark):
    rows = [("a", t, 7 * (t % 5)) for t in range(25)]
    got = _run(spark, rows, period=5)
    assert got == _python_mirror(rows, 5)
    # odd-period MA of an exact zero-trend cycle: trend is the cycle
    # mean, constant on interior rows
    interior = [
        got[("a", t)][2] for t in range(2, 23)
    ]
    assert len(set(interior)) == 1


def test_irregular_series_raises(spark):
    rows = [("a", t, 1) for t in (0, 1, 3, 4)]
    with pytest.raises(Exception, match="irregular"):
        _run(spark, rows, period=2)
    with pytest.raises(Exception, match="irregular"):
        _run(spark, [("a", 0, 1), ("a", 0, 2), ("a", 1, 3)], period=2)


def test_params_validated(spark):
    with pytest.raises(ValueError, match="period"):
        temporal.seasonal_decompose_sql("t", "k", "t", "y", period=1)


def test_random_matches_mirror_and_duckdb(spark):
    rng = random.Random(43)
    rows = []
    for k in ("x", "y"):
        n = rng.randrange(30, 60)
        rows += [
            (k, t, rng.randrange(0, 50) + 3 * (t % 6))
            for t in range(n)
        ]
    got = _run(spark, rows, period=6)
    assert got == _python_mirror(rows, 6)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, t BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql_rows = con.execute(
        temporal.seasonal_decompose_sql("t", "k", "t", "y", period=6)
    ).fetchall()
    assert {
        (r[0], r[1]): tuple(r[2:]) for r in sql_rows
    } == got

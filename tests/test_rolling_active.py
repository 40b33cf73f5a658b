"""Rolling active users (temporal.rolling_active_users) — returning
users counted once per window, gap days, window edges, a Python
mirror, and DuckDB twin parity."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("rau-tests", master="local[4]",
                    shuffle_partitions=8)


EPOCH = dt.datetime(1970, 1, 1)


def _ts(day, hour=12):
    return EPOCH + dt.timedelta(days=day, hours=hour)


def _python(rows, short=7, long_=28):
    facts = {(int((t - EPOCH).days), u) for u, t in rows}
    days = sorted({d for d, _ in facts})
    out = {}
    for d in days:
        dau = {u for dd, u in facts if dd == d}
        act_s = {u for dd, u in facts if 0 <= d - dd < short}
        act_l = {u for dd, u in facts if 0 <= d - dd < long_}
        out[d] = (len(dau), len(act_s), len(act_l))
    return out


def _spark(spark, rows, **kw):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = temporal.rolling_active_users(df, **kw).collect()
    return {r["day"]: (r["dau"], r["active_short"], r["active_long"])
            for r in got}


def test_returning_user_counted_once(spark):
    """One user active days 0..6: every day has dau 1 AND wau 1 —
    a SUM of daily distincts would report 7."""
    rows = [(1, _ts(d)) for d in range(7)]
    got = _spark(spark, rows)
    assert got == {d: (1, 1, 1) for d in range(7)}


def test_window_edges(spark):
    """User active day 0 only; second user keeps later days alive.
    Day 6 still counts user 1 in the 7-day window, day 7 does not;
    day 27 still counts in the 28-day window, day 28 does not."""
    rows = [(1, _ts(0))] + [(2, _ts(d)) for d in (6, 7, 27, 28)]
    got = _spark(spark, rows)
    assert got[6] == (1, 2, 2)
    assert got[7] == (1, 1, 2)
    assert got[27] == (1, 1, 2)
    assert got[28] == (1, 1, 1)


def test_gap_days_emit_nothing(spark):
    """Days with no activity produce no row even inside a window."""
    rows = [(1, _ts(0)), (1, _ts(5))]
    got = _spark(spark, rows)
    assert set(got) == {0, 5}
    assert got[5] == (1, 1, 1)


def test_multiple_events_same_day_dedup(spark):
    rows = [(1, _ts(3, 1)), (1, _ts(3, 9)), (2, _ts(3, 5))]
    got = _spark(spark, rows)
    assert got == {3: (2, 2, 2)}


def test_validation(spark):
    df = spark.createDataFrame([(1, _ts(0))], "user_id long, ts timestamp")
    with pytest.raises(ValueError, match="short_days"):
        temporal.rolling_active_users(df, short_days=0)
    with pytest.raises(ValueError, match="short_days"):
        temporal.rolling_active_users(df, short_days=9, long_days=7)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(2468)
    rows = [
        (rng.randrange(15), _ts(rng.randrange(40), rng.randrange(24)))
        for _ in range(400)
    ]
    want = _python(rows)
    assert _spark(spark, rows) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE e (user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            temporal.rolling_active_users_sql("e")
        ).fetchall()
    }
    assert got == want

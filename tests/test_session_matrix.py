"""Session entry→exit matrix (temporal.session_entry_exit) — gap-split
semantics, bounce diagonal, same-timestamp tiebreak determinism,
random ≡ Python mirror ≡ DuckDB twin."""

import datetime
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("sesmx-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime.datetime(2026, 3, 1)


def _ev(uid, sec, ty, eid):
    return (uid, T0 + datetime.timedelta(seconds=sec), ty, eid)


def _run(spark, evs, gap_s=1800):
    df = spark.createDataFrame(
        evs, "user_id long, ts timestamp, ty string, event_id long"
    )
    out = temporal.session_entry_exit(
        df, "user_id", "ts", "ty", "event_id", gap_s=gap_s
    ).collect()
    return {
        (r.entry_type, r.exit_type): (r.n_sessions, r.n_bounces,
                                      r.total_events)
        for r in out
    }


def _mirror(evs, gap_s=1800):
    byu = {}
    for uid, ts, ty, eid in evs:
        t = int(ts.timestamp() * 1_000_000)
        byu.setdefault(uid, []).append((t, eid, ty))
    out = {}
    for uid, rows in byu.items():
        rows.sort()
        sessions, cur = [], [rows[0]]
        for prev, nxt in zip(rows, rows[1:]):
            if nxt[0] - prev[0] > gap_s * 1_000_000:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for s in sessions:
            key = (s[0][2], s[-1][2])
            n, b, t_ = out.get(key, (0, 0, 0))
            out[key] = (n + 1, b + (len(s) == 1), t_ + len(s))
    return out


def test_basic_matrix_and_bounce(spark):
    evs = [
        _ev(1, 0, "home", 1), _ev(1, 60, "search", 2),
        _ev(1, 120, "buy", 3),
        _ev(1, 10_000, "home", 4),               # bounce session
        _ev(2, 0, "search", 5), _ev(2, 30, "home", 6),
    ]
    got = _run(spark, evs)
    assert got[("home", "buy")] == (1, 0, 3)
    assert got[("home", "home")] == (1, 1, 1)
    assert got[("search", "home")] == (1, 0, 2)


def test_same_timestamp_tiebreak(spark):
    # two events at the same instant: event_id orders them
    evs = [_ev(1, 0, "b", 2), _ev(1, 0, "a", 1)]
    got = _run(spark, evs)
    assert got == {("a", "b"): (1, 0, 2)}


def test_gap_exactly_at_threshold_keeps_session(spark):
    evs = [_ev(1, 0, "x", 1), _ev(1, 1800, "y", 2),
           _ev(2, 0, "x", 3), _ev(2, 1801, "y", 4)]
    got = _run(spark, evs)
    assert got[("x", "y")] == (1, 0, 2)          # user 1: one session
    assert got[("x", "x")] == (1, 1, 1)          # user 2 split
    assert got[("y", "y")] == (1, 1, 1)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(321)
    evs = []
    eid = 0
    for uid in range(12):
        t = 0
        for _ in range(rng.randrange(1, 40)):
            t += rng.choice([10, 100, 600, 2000, 4000])
            eid += 1
            evs.append(_ev(uid, t, rng.choice("abcd"), eid))
    got = _run(spark, evs)
    assert got == _mirror(evs)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(user_id BIGINT, ts TIMESTAMP, ty VARCHAR, "
        "event_id BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", evs)
    rows = con.execute(temporal.session_entry_exit_sql(
        "t", "user_id", "ts", "ty", "event_id"
    )).fetchall()
    assert {(r[0], r[1]): tuple(r[2:]) for r in rows} == got

"""Top-k session journeys (temporal.session_paths) — gap splits,
total-order path assembly at tied timestamps, rank tie rules, the
k-th-count pre-cut keeps ties, bot guard, random ≡ mirror ≡ twin."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("spaths-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"
T0 = dt.datetime(2025, 1, 1)


def _ev(uid, sec, ty, eid):
    return (uid, T0 + dt.timedelta(seconds=sec), ty, eid)


def _run(spark, rows, k=20, gap_s=1800):
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.session_paths(
        df, "user_id", "ts", "event_type", "event_id",
        gap_s=gap_s, k=k,
    ).collect()
    return [(r.rank, r.path, r.n_sessions)
            for r in sorted(out, key=lambda r: r.rank)]


def _mirror(rows, k=20, gap_s=1800):
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, ts, ty, eid in rows:
        by_user[uid].append((int(ts.timestamp() * 1e6), eid, ty))
    counts = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        path = []
        prev = None
        for t, eid, ty in evs:
            if prev is not None and t - prev > gap_s * 1_000_000:
                counts[">".join(path)] += 1
                path = []
            path.append(ty)
            prev = t
        counts[">".join(path)] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(i + 1, p, n) for i, (p, n) in enumerate(ranked[:k])]


def test_gap_splits_and_counts(spark):
    rows = [
        _ev(1, 0, "view", 1), _ev(1, 10, "click", 2),
        _ev(1, 10_000, "view", 3), _ev(1, 10_005, "click", 4),
        _ev(2, 0, "view", 5), _ev(2, 5, "click", 6),
    ]
    got = _run(spark, rows)
    assert got == [(1, "view>click", 3)]


def test_tied_timestamps_total_order(spark):
    rows = [_ev(1, 0, "b", 2), _ev(1, 0, "a", 1)]
    got = _run(spark, rows)
    assert got == [(1, "a>b", 1)]   # event_id breaks the tie


def test_rank_tie_rules(spark):
    rows = [
        _ev(1, 0, "x", 1), _ev(2, 0, "y", 2), _ev(3, 0, "x", 3),
    ]
    got = _run(spark, rows, k=2)
    assert got == [(1, "x", 2), (2, "y", 1)]


def test_bot_guard(spark):
    rows = [_ev(1, i, "view", i) for i in range(70)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(Exception, match="max_path_len"):
        temporal.session_paths(
            df, "user_id", "ts", "event_type", "event_id",
            max_path_len=64,
        ).collect()


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(515)
    rows = []
    eid = 0
    for uid in range(40):
        t = 0
        for _ in range(rng.randrange(1, 15)):
            t += rng.choice([5, 30, 4000])
            rows.append(_ev(uid, t, rng.choice("abc"), eid))
            eid += 1
    got = _run(spark, rows, k=10)
    assert got == _mirror(rows, k=10)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(user_id BIGINT, ts TIMESTAMP, "
                "event_type VARCHAR, event_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    out = con.execute(temporal.session_paths_sql(
        "t", "user_id", "ts", "event_type", "event_id", k=10
    )).fetchall()
    assert [tuple(r) for r in out] == got

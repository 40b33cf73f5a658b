"""Funnel step-latency quantiles (temporal.funnel_latency) — planted
journeys with closed-form quantile ranks, agreement with event_funnel
on who converts, Python mirror + DuckDB twin parity."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal

T0 = dt.datetime(2024, 3, 1)
US = 1_000_000


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("funnel-latency-tests", master="local[4]",
                    shuffle_partitions=8)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(s), t) for u, s, t in rows],
        "user_id bigint, ts timestamp, event_type string",
    )


def _run(spark, rows, steps, gap=3600):
    out = temporal.funnel_latency(
        _df(spark, rows), steps, gap
    ).collect()
    return {
        r.step: (r.event_type, r.n_users, r.min_us, r.p50_us,
                 r.p90_us, r.max_us)
        for r in out
    }


def test_two_user_quantile_ranks(spark):
    """n=2 latencies {10 s, 30 s}: lower nearest-rank p50 = rank
    (2+1) DIV 2 = 1 → 10 s; p90 = rank (18+9) DIV 10 = 2 → 30 s."""
    rows = [(1, 0, "view"), (1, 10, "click"),
            (2, 0, "view"), (2, 30, "click")]
    got = _run(spark, rows, ["view", "click"])
    assert got[2] == ("click", 2, 10 * US, 10 * US, 30 * US, 30 * US)


def test_gap_window_excludes_slow_hop(spark):
    rows = [(1, 0, "view"), (1, 5000, "click")]
    got = _run(spark, rows, ["view", "click"], gap=3600)
    assert 2 not in got


def test_greedy_earliest_completion(spark):
    """Two candidate step-2 events: the earliest feasible one sets
    the latency (and the step-3 anchor)."""
    rows = [(1, 0, "view"), (1, 20, "click"), (1, 50, "click"),
            (1, 60, "purchase")]
    got = _run(spark, rows, ["view", "click", "purchase"])
    assert got[2][2] == 20 * US          # min latency = 20 s
    assert got[3][2] == 40 * US          # purchase anchored at 20 s


def test_agrees_with_event_funnel_counts(spark):
    rng = random.Random(31)
    types = ["view", "click", "purchase", "error"]
    rows = []
    for u in range(30):
        s = 0
        for _ in range(rng.randrange(3, 15)):
            s += rng.randrange(1, 2500)
            rows.append((u, s, rng.choice(types)))
    steps = ["view", "click", "purchase"]
    lat = _run(spark, rows, steps, gap=3000)
    fun = {
        r.step: r.n_users
        for r in temporal.event_funnel(
            _df(spark, rows), steps, 3000
        ).collect()
    }
    for k in (2, 3):
        assert lat.get(k, (None, 0))[1] == fun[k]


def _python_mirror(rows, steps, gap):
    by_u = {}
    for u, s, t in rows:
        by_u.setdefault(u, []).append((s * US, t))
    lats = {}
    for u, evs in by_u.items():
        evs.sort()
        prev = min(
            (us for us, t in evs if t == steps[0]), default=None
        )
        if prev is None:
            continue
        for k, s in enumerate(steps[1:], start=2):
            nxt = min(
                (us for us, t in evs
                 if t == s and prev < us <= prev + gap * US),
                default=None,
            )
            if nxt is None:
                break
            lats.setdefault(k, []).append(nxt - prev)
            prev = nxt
    out = {}
    for k, v in lats.items():
        v.sort()
        n = len(v)
        out[k] = (steps[k - 1], n, v[0], v[(n + 1) // 2 - 1],
                  v[(9 * n + 9) // 10 - 1], v[-1])
    return out


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(8)
    types = ["view", "click", "purchase"]
    rows = []
    for u in range(40):
        s = 0
        for _ in range(rng.randrange(4, 20)):
            s += rng.randrange(1, 1800)
            rows.append((u, s, rng.choice(types)))
    steps = ["view", "click", "purchase"]
    got = _run(spark, rows, steps, gap=2400)
    want = _python_mirror(rows, steps, 2400)
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev(user_id BIGINT, ts TIMESTAMP, "
        "event_type VARCHAR)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, ?)",
        [(u, _ts(s), t) for u, s, t in rows],
    )
    got_sql = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            temporal.funnel_latency_sql("ev", steps, 2400)
        ).fetchall()
    }
    assert got == got_sql


def test_steps_validated(spark):
    with pytest.raises(ValueError):
        temporal.funnel_latency_sql("ev", ["view"], 60)

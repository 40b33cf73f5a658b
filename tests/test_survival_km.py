"""Kaplan–Meier survival (temporal.survival_km) — hand-walked curve,
censoring leaves the risk set without a death step, tied deaths, the
floor-ladder quantization pinned, all-censored empty curve, loud
max_steps guard, random ≡ integer mirror ≡ recursive-CTE twin."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("km-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "user_id long, ts timestamp"
T0 = dt.datetime(2024, 1, 1)


def _ev(uid, sec):
    return (uid, T0 + dt.timedelta(seconds=sec))


def _run(spark, rows, bucket_s=1, horizon=2, max_steps=4096):
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.survival_km(
        df, "user_id", "ts", bucket_s=bucket_s, horizon=horizon,
        max_steps=max_steps,
    ).collect()
    return [
        (r.dur_buckets, r.n_at_risk, r.deaths, r.surv_ppm,
         r.cumhaz_ppm)
        for r in out
    ]


def _mirror(rows, bucket_s=1, horizon=2):
    base = dt.datetime(1970, 1, 1)
    users = {}
    for uid, ts in rows:
        b = int((ts - base).total_seconds() * 1_000_000) \
            // (bucket_s * 1_000_000)
        f, l = users.get(uid, (b, b))
        users[uid] = (min(f, b), max(l, b))
    if not users:
        return []
    end = max(l for _, l in users.values())
    durs = {}
    for f, l in users.values():
        dur = l - f
        m, d = durs.get(dur, (0, 0))
        durs[dur] = (m + 1, d + (1 if end - l > horizon else 0))
    n = len(users)
    s, h, seen, out = 1_000_000, 0, 0, []
    for dur in sorted(durs):
        m, d = durs[dur]
        risk = n - seen
        if d > 0:
            s = (s * (risk - d)) // risk
            h = h + (d * 1_000_000) // risk
            out.append((dur, risk, d, s, h))
        seen += m
    return out


def test_hand_walked_curve(spark):
    # corpus end = 12.  horizon 2: last=10 → 12-10=2, NOT > 2 →
    # censored; B and C churn at lifetime 4 (tied deaths).
    rows = (
        [_ev(1, 0), _ev(1, 10)]      # dur 10, censored
        + [_ev(2, 0), _ev(2, 4)]     # dur 4, death
        + [_ev(3, 2), _ev(3, 6)]     # dur 4, death
        + [_ev(4, 5), _ev(4, 12)]    # dur 7, censored
        + [_ev(5, 3), _ev(5, 12)]    # dur 9, censored
    )
    got = _run(spark, rows)
    # one death step: n_at_risk=5, d=2 → S=floor(3e6/5)=600000,
    # H=floor(2e6/5)=400000
    assert got == [(4, 5, 2, 600000, 400000)]
    assert got == _mirror(rows)


def test_floor_ladder_pinned(spark):
    # sentinel subject pins corpus end far out so all three others
    # churn; deaths at lifetimes 1, 2, 3 with shrinking risk sets.
    rows = (
        [_ev(9, 100)]                # dur 0, censored (defines end)
        + [_ev(1, 0), _ev(1, 1)]     # dur 1, death
        + [_ev(2, 1), _ev(2, 3)]     # dur 2, death
        + [_ev(3, 3), _ev(3, 6)]     # dur 3, death
    )
    got = _run(spark, rows)
    assert got == [
        # the dur-0 censored sentinel leaves the risk set BEFORE
        # lifetime 1, so the first death sees n_at_risk = 3
        (1, 3, 1, 666666, 333333),
        (2, 2, 1, 333333, 833333),
        (3, 1, 1, 0, 1833333),
    ]
    assert got == _mirror(rows)


def test_censoring_shrinks_risk_without_step(spark):
    # censored subject at lifetime 5 sits IN the risk set for the
    # death at 5 (standard convention) but OUT for the death at 8.
    rows = (
        [_ev(9, 200)]                 # sentinel, dur 0
        + [_ev(1, 0), _ev(1, 5)]      # dur 5, death (200-5 > 2)
        + [_ev(2, 193), _ev(2, 198)]  # dur 5, censored (200-198=2)
        + [_ev(3, 0), _ev(3, 8)]      # dur 8, death
    )
    got = _run(spark, rows)
    assert got == [
        (5, 3, 1, 666666, 333333),   # risk {1,2,3}: censored-at-5 in
        (8, 1, 1, 0, 1333333),       # only subject 3 remains at 8
    ]
    assert got == _mirror(rows)


def test_all_censored_empty_curve(spark):
    rows = [_ev(1, 0), _ev(1, 10), _ev(2, 5), _ev(2, 9)]
    assert _run(spark, rows, horizon=100) == []


def test_single_event_subjects(spark):
    # every subject has lifetime 0; deaths collapse onto one step.
    rows = [_ev(9, 50), _ev(1, 0), _ev(2, 10), _ev(3, 20)]
    got = _run(spark, rows)
    # subjects 1,2,3 churn at dur 0; sentinel censored at dur 0.
    assert got == [(0, 4, 3, 250000, 750000)]
    assert got == _mirror(rows)


def test_bucketing(spark):
    # bucket_s=10: seconds 0..9 → bucket 0, 10..19 → bucket 1.
    rows = [_ev(9, 500), _ev(1, 3), _ev(1, 17)]  # buckets 0 and 1
    got = _run(spark, rows, bucket_s=10, horizon=2)
    assert got == [(1, 1, 1, 0, 1000000)]
    assert got == _mirror(rows, bucket_s=10, horizon=2)


def test_max_steps_guard(spark):
    rows = [_ev(9, 100), _ev(1, 0), _ev(1, 1), _ev(2, 0), _ev(2, 5)]
    with pytest.raises(Exception, match="max_steps"):
        _run(spark, rows, max_steps=1)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(4242)
    rows = []
    for uid in range(60):
        for _ in range(rng.randrange(1, 8)):
            rows.append(_ev(uid, rng.randrange(0, 5000)))
    got = _run(spark, rows, bucket_s=60, horizon=5)
    assert got == _mirror(rows, bucket_s=60, horizon=5)
    assert len(got) >= 3  # non-degenerate
    con = duckdb.connect()
    con.execute("CREATE TABLE t(user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(temporal.survival_km_sql(
        "t", "user_id", "ts", bucket_s=60, horizon=5
    )).fetchall()
    assert [tuple(r) for r in out] == got

"""Markov removal-effect attribution (temporal.markov_attribution) —
hand-walked two-journey chain, conversion-split journeys, floor
ladder pinned, untouched channel scores zero effect, undeclared type
raises, validation, random ≡ unrolled-CTE twin."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("mkatt-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"
T0 = dt.datetime(2024, 6, 1)


def _ev(uid, sec, ty, eid):
    return (uid, T0 + dt.timedelta(seconds=sec), ty, eid)


def _run(spark, rows, channels, conv="buy", rounds=12):
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.markov_attribution(
        df, channels, conv, rounds=rounds
    ).collect()
    return {
        r.channel: (r.n_touches, r.conv_full_ppm, r.conv_removed_ppm,
                    r.effect_ppm, r.share_ppm)
        for r in out
    }


def test_hand_walked_chain(spark):
    # user 1: view, click, buy, view → journey 0 converts via
    # view→click→CONV; journey 1 (trailing view) dies in NULL.
    rows = [
        _ev(1, 0, "view", 1), _ev(1, 10, "click", 2),
        _ev(1, 20, "buy", 3), _ev(1, 30, "view", 4),
    ]
    got = _run(spark, rows, ["view", "click"])
    # chain: START→view (×2), view→click, view→NULL, click→CONV
    # P(click)=10⁶, P(view)=½·10⁶, P(START)=P(view)=500000
    # removing either channel severs every converting path → 10⁶
    assert got["view"] == (2, 500000, 0, 1000000, 500000)
    assert got["click"] == (1, 500000, 0, 1000000, 500000)


def test_conversion_splits_journeys(spark):
    # view,buy,click,buy → two converting journeys, no NULL exits:
    # full conversion probability is exactly 1.
    rows = [
        _ev(1, 0, "view", 1), _ev(1, 1, "buy", 2),
        _ev(1, 2, "click", 3), _ev(1, 3, "buy", 4),
    ]
    got = _run(spark, rows, ["view", "click"])
    assert got["view"][1] == 1_000_000
    # removing view still leaves START→click→CONV: P = ½
    assert got["view"][2] == 500_000
    assert got["view"][3] == 500_000   # effect = 1 − ½
    assert got["click"][2] == 500_000


def test_floor_ladder_pinned(spark):
    # one channel x: x→CONV once, x→NULL twice ⇒ P(x) = 10⁶//3
    rows = [
        _ev(1, 0, "x", 1), _ev(1, 1, "buy", 2),
        _ev(2, 0, "x", 3),
        _ev(3, 0, "x", 4),
    ]
    got = _run(spark, rows, ["x"])
    assert got["x"][0] == 3
    assert got["x"][1] == 333_333      # floor(10⁶/3)
    assert got["x"] == (3, 333333, 0, 1000000, 1000000)


def test_untouched_channel_zero_effect(spark):
    rows = [_ev(1, 0, "x", 1), _ev(1, 1, "buy", 2)]
    got = _run(spark, rows, ["x", "ghost"])
    assert got["ghost"] == (0, 1000000, 1000000, 0, 0)
    assert got["x"][3] == 1_000_000


def test_undeclared_type_raises(spark):
    rows = [_ev(1, 0, "x", 1), _ev(1, 1, "rogue", 2)]
    with pytest.raises(Exception, match="outside declared"):
        _run(spark, rows, ["x"])


def test_validation(spark):
    rows = [_ev(1, 0, "x", 1)]
    with pytest.raises(ValueError, match="1..16"):
        _run(spark, rows, [])
    with pytest.raises(ValueError, match="distinct"):
        _run(spark, rows, ["x", "x"])
    with pytest.raises(ValueError, match="channel"):
        _run(spark, rows, ["x", "buy"])
    with pytest.raises(ValueError, match="reserved"):
        _run(spark, rows, ["x", "CONV"])


def test_random_vs_twin(spark):
    rng = random.Random(909)
    rows = []
    eid = 0
    for uid in range(30):
        for _ in range(rng.randrange(1, 12)):
            rows.append(
                _ev(uid, eid, rng.choice(["a", "b", "c", "z"]), eid)
            )
            eid += 1
    got = _run(spark, rows, ["a", "b", "c"], conv="z", rounds=10)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(user_id BIGINT, ts TIMESTAMP, "
                "event_type VARCHAR, event_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    out = con.execute(temporal.markov_attribution_sql(
        "t", ["a", "b", "c"], "z", rounds=10
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got
    # sanity: some conversion probability exists and shares sum ≤ 10⁶
    full = next(iter(got.values()))[1]
    assert full > 0
    shares = [v[4] for v in got.values() if v[4] is not None]
    assert sum(shares) <= 1_000_000

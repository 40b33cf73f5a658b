"""Ordered-sequence funnel (temporal.event_funnel)."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("funnel-tests", master="local[4]",
                    shuffle_partitions=8)


DDL = "user_id bigint, ts timestamp, event_type string"
T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_step_semantics(spark):
    rows = [
        # u1 completes all three in order within gap
        (1, _ts(0), "view"), (1, _ts(5), "click"), (1, _ts(9), "purchase"),
        # u2 clicks BEFORE viewing — click must not count
        (2, _ts(10), "click"), (2, _ts(20), "view"),
        # u3 views, clicks too late (gap 15 min)
        (3, _ts(0), "view"), (3, _ts(30), "click"),
        # u4 same-timestamp click — strictly-after rule drops it,
        # but a later in-gap click still counts
        (4, _ts(0), "view"), (4, _ts(0), "click"), (4, _ts(4), "click"),
        # u5 never views
        (5, _ts(0), "purchase"),
    ]
    df = spark.createDataFrame(rows, DDL)
    out = {r.step: r.n_users for r in temporal.event_funnel(
        df, ["view", "click", "purchase"], 15 * 60).collect()}
    assert out == {1: 4, 2: 2, 3: 1}


def test_greedy_earliest_is_counted_from_first_view(spark):
    """The gap is measured from the EARLIEST step-1 event: a user
    whose first view is stale but who views again later does NOT get a
    fresh window (earliest-completion convention, pinned)."""
    rows = [
        (1, _ts(0), "view"), (1, _ts(100), "view"), (1, _ts(105), "click"),
    ]
    df = spark.createDataFrame(rows, DDL)
    out = {r.step: r.n_users for r in temporal.event_funnel(
        df, ["view", "click"], 15 * 60).collect()}
    assert out == {1: 1, 2: 0}


def test_duckdb_twin_matches(spark):
    rng = random.Random(4)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (rng.randrange(40), _ts(rng.randrange(0, 5000)), rng.choice(types))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, DDL)
    got = sorted(map(tuple, temporal.event_funnel(
        df, ["view", "click", "purchase"], 3600).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(user_id BIGINT, ts TIMESTAMP, "
        "event_type VARCHAR)")
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(temporal.event_funnel_sql(
        "events", ["view", "click", "purchase"], 3600)).fetchall()))
    assert got == want


def test_counts_non_increasing(spark):
    rng = random.Random(9)
    rows = [
        (rng.randrange(30), _ts(rng.randrange(0, 2000)),
         rng.choice(["view", "click", "signup", "purchase"]))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, DDL)
    out = [r.n_users for r in temporal.event_funnel(
        df, ["view", "click", "signup", "purchase"], 86400
    ).orderBy("step").collect()]
    assert all(a >= b for a, b in zip(out, out[1:]))


def test_empty_steps_rejected(spark):
    df = spark.createDataFrame([], DDL)
    with pytest.raises(ValueError):
        temporal.event_funnel(df, [], 60)


def test_retention_planted(spark):
    rows = [
        # u1: cohort day 0, returns day 1 and day 3
        (1, T0, "view"), (1, _ts(60 * 25), "view"),
        (1, _ts(60 * 24 * 3 + 5), "click"),
        # u2: cohort day 1 only (two events same day = one active day)
        (2, _ts(60 * 24), "view"), (2, _ts(60 * 24 + 30), "click"),
        # u3: cohort day 0, returns past max_offset → offset row dropped
        (3, T0, "view"), (3, _ts(60 * 24 * 30), "view"),
    ]
    df = spark.createDataFrame(rows, DDL)
    out = {(r.cohort_day, r.day_offset): r.n_users
           for r in temporal.event_retention(df, max_offset=7).collect()}
    d0 = int(T0.timestamp() * 1_000_000) // 86_400_000_000
    assert out == {
        (d0, 0): 2, (d0, 1): 1, (d0, 3): 1,
        (d0 + 1, 0): 1,
    }


def test_retention_duckdb_twin(spark):
    rng = random.Random(8)
    rows = [
        (rng.randrange(50), _ts(rng.randrange(0, 60 * 24 * 20)), "view")
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, DDL)
    got = sorted(map(tuple,
                     temporal.event_retention(df, max_offset=10).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE ev2(user_id BIGINT, ts TIMESTAMP, "
                "event_type VARCHAR)")
    con.executemany("INSERT INTO ev2 VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        temporal.event_retention_sql("ev2", max_offset=10)).fetchall()))
    assert got == want


def test_transitions_planted(spark):
    rows = [
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "view"),
        (2, _ts(0), "view"), (2, _ts(1), "click"),
        (3, _ts(5), "view"), (3, _ts(6), "view"),
    ]
    df = spark.createDataFrame(rows, DDL)
    out = {(r.from_type, r.to_type): (r.n_pairs, r.p_ppm)
           for r in temporal.event_transitions(df).collect()}
    # from view: →click ×2 (u1, u2), →view ×1 (u3) — u1's trailing
    # view has no successor; from click: →view ×1 (u1)
    assert out[("view", "click")] == (2, 666_666)
    assert out[("view", "view")] == (1, 333_333)
    assert out[("click", "view")] == (1, 1_000_000)
    assert ("click", "click") not in out


def test_transitions_duckdb_twin(spark):
    rng = random.Random(12)
    rows = [
        (rng.randrange(30), _ts(rng.randrange(0, 3000)),
         rng.choice(["view", "click", "error", "signup"]))
        for _ in range(2500)
    ]
    df = spark.createDataFrame(rows, DDL)
    got = sorted(map(tuple, temporal.event_transitions(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE ev3(user_id BIGINT, ts TIMESTAMP, "
                "event_type VARCHAR)")
    con.executemany("INSERT INTO ev3 VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        temporal.event_transitions_sql("ev3")).fetchall()))
    assert got == want

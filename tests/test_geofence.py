"""Geofence enter/exit extraction (temporal.geofence_transitions) —
event semantics (first-point enter, unmatched final enter, bounce
pairs), [min,max) boundary convention, and DuckDB twin parity."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("geofence-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = dt.datetime(2024, 1, 1)
FENCE = [(1, 0.0, 0.0, 10.0, 10.0)]


def _t(m):
    return T0 + dt.timedelta(minutes=m)


def _run(spark, rows, fences=FENCE):
    p = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    f = spark.createDataFrame(
        fences,
        "fence_id int, min_lon double, min_lat double, "
        "max_lon double, max_lat double",
    )
    out = temporal.geofence_transitions(p, f)
    return sorted(
        ((r.user_id, r.fence_id, r.event, r.ts_us) for r in out.collect()),
        key=lambda t: (t[0], t[1], t[3]),
    )


def _us(m):
    return int((_t(m) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)


def test_enter_cross_exit(spark):
    rows = [
        (1, _t(0), -5.0, 5.0),   # outside
        (1, _t(1), 5.0, 5.0),    # enter
        (1, _t(2), 6.0, 5.0),    # still in — no event
        (1, _t(3), 15.0, 5.0),   # exit
    ]
    assert _run(spark, rows) == [
        (1, 1, "enter", _us(1)),
        (1, 1, "exit", _us(3)),
    ]


def test_first_point_inside_enters_and_unmatched_final(spark):
    rows = [(2, _t(0), 5.0, 5.0), (2, _t(1), 5.5, 5.0)]
    assert _run(spark, rows) == [(2, 1, "enter", _us(0))]


def test_bounce_yields_exit_enter_pair(spark):
    rows = [
        (3, _t(0), 5.0, 5.0),
        (3, _t(1), 50.0, 5.0),
        (3, _t(2), 5.0, 5.0),
    ]
    assert _run(spark, rows) == [
        (3, 1, "enter", _us(0)),
        (3, 1, "exit", _us(1)),
        (3, 1, "enter", _us(2)),
    ]


def test_boundary_min_inclusive_max_exclusive(spark):
    rows = [
        (4, _t(0), 0.0, 0.0),     # min corner: inside
        (4, _t(1), 10.0, 5.0),    # max lon: outside → exit
    ]
    assert _run(spark, rows) == [
        (4, 1, "enter", _us(0)),
        (4, 1, "exit", _us(1)),
    ]


def test_multiple_fences_independent(spark):
    fences = FENCE + [(2, 4.0, 4.0, 6.0, 6.0)]
    rows = [
        (5, _t(0), 5.0, 5.0),   # inside both
        (5, _t(1), 8.0, 8.0),   # inside 1, outside 2
    ]
    assert _run(spark, rows, fences) == [
        (5, 1, "enter", _us(0)),
        (5, 2, "enter", _us(0)),
        (5, 2, "exit", _us(1)),
    ]


def test_duckdb_twin_parity(spark):
    rng = random.Random(12)
    rows = [
        (u, _t(i * 3), rng.uniform(-15.0, 25.0), rng.uniform(-15.0, 25.0))
        for u in range(6)
        for i in range(40)
    ]
    fences = FENCE + [(2, -10.0, -10.0, 20.0, 0.0)]
    got = _run(spark, rows, fences)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts (user_id BIGINT, ts TIMESTAMP, "
        "lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO pts VALUES (?, ?, ?, ?)", rows)
    con.execute(
        "CREATE TABLE fences (fence_id INT, min_lon DOUBLE, "
        "min_lat DOUBLE, max_lon DOUBLE, max_lat DOUBLE)"
    )
    con.executemany("INSERT INTO fences VALUES (?, ?, ?, ?, ?)", fences)
    twin = sorted(
        (tuple(r) for r in con.execute(
            temporal.geofence_transitions_sql("pts", "fences")
        ).fetchall()),
        key=lambda t: (t[0], t[1], t[3]),
    )
    assert twin == got and len(got) > 20

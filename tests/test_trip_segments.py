"""Trajectory trip segmentation (spatial.trip_segments).

Planted-case semantics: a temporal gap opens a trip, a spatial jump
opens a trip, the opening edge contributes no length, within-trip
lengths are exact µkm sums, and a tie on ts is resolved by the
tiebreak column so boundaries are parallelism-independent.
"""

import datetime as dt

import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("trip-segments-tests", master="local[4]",
                    shuffle_partitions=8)


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, "
              "lon double, lat double"
    )
    out = spatial.trip_segments(
        df, "user_id", "ts", tiebreak=("event_id",), **kw
    )
    return sorted(
        ((r["user_id"], r["trip_no"], r["n_points"], r["length_km"])
         for r in out.collect())
    )


def test_gap_and_jump_each_open_a_trip(spark):
    rows = [
        # trip 1: two close points, 1 min apart
        (1, _ts(0), 1, 0.0, 0.0),
        (1, _ts(1), 2, 0.001, 0.0),     # ~111 m edge
        # temporal gap (2 h > 1 h default) -> trip 2
        (1, _ts(121), 3, 0.002, 0.0),
        # spatial jump ~555 km -> trip 3 (time gap only 1 min)
        (1, _ts(122), 4, 5.0, 0.0),
    ]
    got = _run(spark, rows)
    assert [(t, n) for (_, t, n, _) in got] == [(1, 2), (2, 1), (3, 1)]
    # trip 1 length = one ~111.19 m edge, exact µkm
    assert abs(got[0][3] - 0.111195) < 1e-4
    # opener edges contribute nothing
    assert got[1][3] == 0.0 and got[2][3] == 0.0


def test_single_point_users_are_one_empty_trip(spark):
    got = _run(spark, [(7, _ts(0), 1, 10.0, 10.0)])
    assert got == [(7, 1, 1, 0.0)]


def test_ts_tie_broken_by_event_id(spark):
    """Two points share a timestamp; the event_id tiebreak makes the
    order (and therefore the jump test) deterministic."""
    rows = [
        (1, _ts(0), 2, 5.0, 0.0),   # second by tiebreak
        (1, _ts(0), 1, 0.0, 0.0),   # first by tiebreak
    ]
    got = _run(spark, rows)
    # 0 -> 5 degrees is a jump: two trips regardless of input order
    assert [(t, n) for (_, t, n, _) in got] == [(1, 1), (2, 1)]


def test_one_shuffle_for_all_windows(spark):
    """All lag/running-sum windows share one partitionBy(id) sort:
    exactly one exchange below the aggregate."""
    df = spark.createDataFrame(
        [(1, _ts(0), 1, 0.0, 0.0), (1, _ts(1), 2, 0.1, 0.0)],
        "user_id long, ts timestamp_ntz, event_id long, "
        "lon double, lat double",
    )
    plan = (
        spatial.trip_segments(df, "user_id", "ts", tiebreak=("event_id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_window_exchanges = plan.count("Exchange hashpartitioning(user_id")
    assert n_window_exchanges == 1, plan

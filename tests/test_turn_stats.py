"""Heading-sector and turn statistics (spatial.turn_stats) — planted
trajectories with known sectors/turns, the stationary chain-break
rule, modal tie-breaks, and DuckDB twin parity on random walks."""

import random
from datetime import datetime, timedelta

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("turn-stats-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime(2024, 1, 1)


def _rows(uid, coords):
    return [
        (uid, T0 + timedelta(seconds=i), float(x), float(y))
        for i, (x, y) in enumerate(coords)
    ]


def _spark_stats(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    out = spatial.turn_stats(df, "user_id", "ts").collect()
    return {
        r["user_id"]: (
            r["n_steps"], r["n_moving"], r["n_straight"], r["n_left"],
            r["n_right"], r["n_uturn"], r["modal_sector"],
        )
        for r in out
    }


def _python_stats(rows_by_uid):
    out = {}
    for uid, coords in rows_by_uid.items():
        up = [(round(x * 1e6), round(y * 1e6)) for x, y in coords]
        secs = []
        for (x1, y1), (x2, y2) in zip(up, up[1:]):
            dx, dy = x2 - x1, y2 - y1
            if dx == 0 and dy == 0:
                secs.append(None)
            elif abs(dx) > abs(dy):
                secs.append(0 if dx > 0 else 4)
            elif abs(dy) > abs(dx):
                secs.append(2 if dy > 0 else 6)
            elif dx > 0:
                secs.append(1 if dy > 0 else 7)
            else:
                secs.append(3 if dy > 0 else 5)
        turns = [
            (b - a) % 8
            for a, b in zip(secs, secs[1:])
            if a is not None and b is not None
        ]
        cnt = [sum(1 for s in secs if s == i) for i in range(8)]
        m = max(cnt) if cnt else 0
        modal = None if m == 0 else cnt.index(m)
        out[uid] = (
            len(secs),
            sum(1 for s in secs if s is not None),
            sum(1 for t in turns if t == 0),
            sum(1 for t in turns if t in (1, 2, 3)),
            sum(1 for t in turns if t in (5, 6, 7)),
            sum(1 for t in turns if t == 4),
            modal,
        )
    return out


def test_square_loop_all_left(spark):
    """CCW unit square: 3 left turns, modal sector E (ties break low)."""
    coords = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    got = _spark_stats(spark, _rows(1, coords))[1]
    # steps: E, N, W, S — four sectors once each; turns: +2, +2, +2 = left
    assert got == (4, 4, 0, 3, 0, 0, 0)


def test_zigzag_uturns_and_diagonals(spark):
    """E then W is a U-turn; equal |dx|=|dy| steps hit the diagonals."""
    coords = [(0, 0), (1, 0), (0, 0), (1, 1), (0, 0)]
    # steps: E, W(U-turn), NE(turn 5 → right), SW(U-turn)
    got = _spark_stats(spark, _rows(2, coords))[2]
    assert got == (4, 4, 0, 0, 1, 2, 0)


def test_stationary_breaks_chain(spark):
    """A zero-motion step has NULL sector and no turn on either side;
    straight runs count as turns of 0."""
    coords = [(0, 0), (1, 0), (2, 0), (2, 0), (3, 0)]
    # steps: E, E(straight), stationary, E — only one turn pair (E,E)
    got = _spark_stats(spark, _rows(3, coords))[3]
    assert got == (4, 3, 1, 0, 0, 0, 0)


def test_single_point_no_rows(spark):
    """An entity with one point has no steps — absent from output."""
    got = _spark_stats(spark, _rows(9, [(5, 5)]))
    assert 9 not in got


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(777)
    rows_by_uid = {}
    all_rows = []
    for uid in range(6):
        coords = [(0.0, 0.0)]
        for _ in range(rng.randrange(5, 40)):
            dx = rng.choice([-2, -1, 0, 1, 2]) * 1e-4
            dy = rng.choice([-2, -1, 0, 1, 2]) * 1e-4
            coords.append((coords[-1][0] + dx, coords[-1][1] + dy))
        rows_by_uid[uid] = coords
        all_rows += _rows(uid, coords)
    want = _python_stats(rows_by_uid)
    got = _spark_stats(spark, all_rows)
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE traj (user_id BIGINT, ts TIMESTAMP, "
        "lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO traj VALUES (?, ?, ?, ?)", all_rows)
    sql = spatial.turn_stats_sql("traj", "user_id", "ts")
    twin = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    assert twin == want

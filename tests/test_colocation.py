"""Spatio-temporal co-location pairs (spatial.colocation_pairs) —
planted same-place-same-time encounters (adjacent cells, window
boundaries, antimeridian), exactly-once pair counting with duplicate
events, the loud occupancy guard, and random parity vs a plain-Python
mirror and the DuckDB twin."""

import random
from datetime import datetime, timedelta

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("colocation-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime(2024, 6, 1)
RES = 10.0          # 36 × 18 grid
COLS, ROWS = 36, 18
WIN = 3600


def _spark_pairs(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    out = spatial.colocation_pairs(
        df, "user_id", "ts", res_deg=RES, window_s=WIN, **kw
    ).collect()
    return {
        (r["id_a"], r["id_b"]): (r["n_moments"], r["first_us"],
                                 r["last_us"])
        for r in out
    }


def _python_pairs(rows):
    """Mirror: cell-granular 3×3 wrap/clamp proximity, |Δt| ≤ WIN µs."""
    def cell(lo, la):
        x = min(max(int((lo + 180.0) // RES), 0), COLS - 1)
        y = min(max(int((la + 90.0) // RES), 0), ROWS - 1)
        return y, x

    ev = [
        (uid, int(ts.timestamp() * 1_000_000), *cell(lo, la))
        for uid, ts, lo, la in rows
    ]
    out = {}
    for i, (ua, ta, ya, xa) in enumerate(ev):
        for ub, tb, yb, xb in ev:
            if ua >= ub or abs(ta - tb) > WIN * 1_000_000:
                continue
            dy = abs(ya - yb)
            dxr = abs(xa - xb)
            dx = min(dxr, COLS - dxr)
            if dy <= 1 and dx <= 1:
                k = (ua, ub)
                n, f, l = out.get(k, (0, None, None))
                lo_t, hi_t = min(ta, tb), max(ta, tb)
                out[k] = (
                    n + 1,
                    lo_t if f is None else min(f, lo_t),
                    hi_t if l is None else max(l, hi_t),
                )
    return out


def _us(dt):
    return int(dt.timestamp() * 1_000_000)


def test_same_cell_same_time(spark):
    rows = [
        (1, T0, 5.0, 5.0),
        (2, T0 + timedelta(minutes=10), 6.0, 6.0),
    ]
    got = _spark_pairs(spark, rows)
    assert got == {
        (1, 2): (1, _us(T0), _us(T0 + timedelta(minutes=10)))
    }


def test_adjacent_cell_counts_far_cell_does_not(spark):
    rows = [
        (1, T0, 5.0, 5.0),      # cell (y=9, x=18)
        (2, T0, 15.0, 5.0),     # adjacent column
        (3, T0, 25.0, 5.0),     # two columns away
    ]
    got = _spark_pairs(spark, rows)
    assert (1, 2) in got and (2, 3) in got and (1, 3) not in got


def test_window_boundary_inclusive_and_beyond(spark):
    rows = [
        (1, T0, 5.0, 5.0),
        (2, T0 + timedelta(seconds=WIN), 5.0, 5.0),        # exactly WIN
        (3, T0 + timedelta(seconds=2 * WIN + 1), 5.0, 5.0),
    ]
    got = _spark_pairs(spark, rows)
    assert (1, 2) in got and (1, 3) not in got


def test_antimeridian_adjacency(spark):
    rows = [
        (1, T0, -179.0, 5.0),   # x = 0
        (2, T0, 179.0, 5.0),    # x = COLS-1, wraps to adjacent
    ]
    assert (1, 2) in _spark_pairs(spark, rows)


def test_duplicate_events_count_separately(spark):
    """Two identical events of user 2 → two co-located moments."""
    rows = [
        (1, T0, 5.0, 5.0),
        (2, T0, 5.0, 5.0),
        (2, T0, 5.0, 5.0),
    ]
    got = _spark_pairs(spark, rows)
    assert got[(1, 2)][0] == 2


def test_occupancy_guard_fires(spark):
    rows = [(uid, T0, 5.0, 5.0) for uid in range(30)]
    with pytest.raises(Exception, match="max_cell_bucket"):
        _spark_pairs(spark, rows, max_cell_bucket=5)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(606)
    rows = [
        (
            rng.randrange(12),
            T0 + timedelta(seconds=rng.randrange(0, 6 * 3600)),
            rng.uniform(-30, 30),
            rng.uniform(-30, 30),
        )
        for _ in range(200)
    ]
    want = _python_pairs(rows)
    got = _spark_pairs(spark, rows)
    assert got == want and len(got) > 10

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP, "
        "lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?)", rows)
    sql = spatial.colocation_pairs_sql(
        "ev", "user_id", "ts", res_deg=RES, window_s=WIN
    )
    twin = {
        (r[0], r[1]): tuple(r[2:]) for r in con.execute(sql).fetchall()
    }
    assert twin == want

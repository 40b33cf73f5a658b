"""Fixed-grid trajectory resampling (spatial.resample_track) —
planted linear tracks reproduced exactly, on-tick fixes verbatim,
trunc-division quantization, duplicate-fix reduction, span edges, and
random parity vs a plain-Python mirror and the DuckDB twin."""

import random
from datetime import datetime, timedelta, timezone

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("resample-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime(2024, 7, 1, tzinfo=timezone.utc)
STEP = 900


def _rows(uid, fixes):
    """fixes: [(offset_s, lon, lat)]"""
    return [
        (uid, (T0 + timedelta(seconds=o)).replace(tzinfo=None),
         float(x), float(y))
        for o, x, y in fixes
    ]


def _spark_resample(spark, rows, step_s=STEP):
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    out = spatial.resample_track(
        df, "user_id", "ts", step_s=step_s
    ).collect()
    return {
        (r["user_id"], r["g_us"]): (r["x_u"], r["y_u"]) for r in out
    }


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _python_resample(rows, step_s=STEP):
    step = step_s * 1_000_000
    by_uid = {}
    for uid, ts, x, y in rows:
        t = int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        p = (round(x * 1e6), round(y * 1e6))
        cur = by_uid.setdefault(uid, {})
        cur[t] = min(cur.get(t, p), p)
    out = {}
    for uid, fx in by_uid.items():
        ts_sorted = sorted(fx)
        lo = ((ts_sorted[0] + step - 1) // step) * step
        hi = (ts_sorted[-1] // step) * step
        g = lo
        while g <= hi:
            prev = max(t for t in ts_sorted if t <= g)
            nxt = min(t for t in ts_sorted if t >= g)
            if prev == nxt:
                out[(uid, g)] = fx[prev]
            else:
                px, py = fx[prev]
                nx, ny = fx[nxt]
                out[(uid, g)] = (
                    px + _trunc_div((nx - px) * (g - prev), nxt - prev),
                    py + _trunc_div((ny - py) * (g - prev), nxt - prev),
                )
            g += step
    return out


def test_linear_track_exact(spark):
    """A perfectly linear track: every grid point lies ON the line
    (interpolation reproduces it exactly at µdeg precision)."""
    # 1 µdeg per second in both axes: lon = t/1e6 degrees
    fixes = [(0, 0.0, 0.0), (3600, 0.0036, 0.0036)]
    got = _spark_resample(spark, _rows(1, fixes))
    t0 = int(T0.timestamp() * 1_000_000)
    assert len(got) == 5           # ticks 0, 900, 1800, 2700, 3600
    for (uid, g), (x, y) in got.items():
        s = (g - t0) // 1_000_000
        assert (x, y) == (s, s)


def test_on_tick_fix_verbatim(spark):
    """A fix exactly on a grid tick is its own bracket — reproduced
    verbatim even when neighbors would interpolate elsewhere."""
    fixes = [(0, 0.0, 0.0), (900, 50.0, -20.0), (1800, 0.0, 0.0)]
    got = _spark_resample(spark, _rows(2, fixes))
    t0 = int(T0.timestamp() * 1_000_000)
    assert got[(2, t0 + 900 * 1_000_000)] == (50_000_000, -20_000_000)


def test_single_fix_on_and_off_tick(spark):
    """One fix on a tick → one verbatim row; one fix off-tick → empty
    grid (no tick inside the span)."""
    on = _spark_resample(spark, _rows(3, [(900, 7.0, 8.0)]))
    assert list(on.values()) == [(7_000_000, 8_000_000)]
    off = _spark_resample(spark, _rows(4, [(450, 7.0, 8.0)]))
    assert off == {}


def test_duplicate_fixes_reduce_min(spark):
    """Two fixes at one instant reduce to the min (x, y) struct before
    bracketing — deterministic at any parallelism."""
    rows = _rows(5, [(0, 3.0, 3.0), (0, 1.0, 9.0), (1800, 1.0, 9.0)])
    got = _spark_resample(spark, rows)
    t0 = int(T0.timestamp() * 1_000_000)
    assert got[(5, t0)] == (1_000_000, 9_000_000)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(515)
    rows = []
    for uid in range(5):
        n = rng.randrange(2, 25)
        offs = sorted(rng.sample(range(0, 40_000), n))
        rows += _rows(uid, [
            (o, rng.uniform(-50, 50), rng.uniform(-50, 50))
            for o in offs
        ])
    want = _python_resample(rows)
    got = _spark_resample(spark, rows)
    assert got == want and len(got) > 50

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE trk (user_id BIGINT, ts TIMESTAMP, "
        "lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO trk VALUES (?, ?, ?, ?)", rows)
    sql = spatial.resample_track_sql("trk", "user_id", "ts", step_s=STEP)
    twin = {
        (r[0], r[1]): (r[2], r[3]) for r in con.execute(sql).fetchall()
    }
    assert twin == want

"""Flock detection (spatial.flock_groups) — planted convoy semantics:
membership change splits runs, gaps split runs, min_size/min_buckets
thresholds, roster cap loud failure, random ≡ Python mirror ≡ twin."""

import datetime
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("flock-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime.datetime(2026, 1, 1)


def _pt(uid, hour, lon, lat):
    return (uid, T0 + datetime.timedelta(hours=hour), lon, lat)


def _run(spark, pts, **kw):
    df = spark.createDataFrame(
        pts, "user_id long, ts timestamp, lon double, lat double"
    )
    out = spatial.flock_groups(
        df, "user_id", "ts", res_deg=1.0, window_s=3600, **kw
    ).collect()
    return sorted(
        (r.members, r.n_members, r.start_bucket, r.n_buckets)
        for r in out
    )


def test_basic_convoy(spark):
    # users 1,2,3 share a cell for 4 consecutive hours
    pts = [
        _pt(u, h, 10.5, 20.5) for u in (1, 2, 3) for h in range(4)
    ]
    got = _run(spark, pts)
    assert len(got) == 1
    assert got[0][0] == "1,2,3" and got[0][1] == 3 and got[0][3] == 4


def test_membership_change_splits(spark):
    # 1,2 for hours 0-1; user 3 joins for hours 2-3 → two flocks
    pts = [_pt(u, h, 10.5, 20.5) for u in (1, 2) for h in range(4)]
    pts += [_pt(3, h, 10.5, 20.5) for h in (2, 3)]
    got = _run(spark, pts)
    assert [(g[0], g[3]) for g in got] == [("1,2", 2), ("1,2,3", 2)]


def test_gap_splits_run(spark):
    pts = [_pt(u, h, 10.5, 20.5) for u in (1, 2) for h in (0, 1, 3, 4)]
    got = _run(spark, pts)
    assert [g[3] for g in got] == [2, 2]


def test_min_size_and_min_buckets(spark):
    pts = [_pt(1, h, 10.5, 20.5) for h in range(5)]          # alone
    pts += [_pt(u, 0, 40.5, 9.5) for u in (7, 8)]            # 1 bucket
    got = _run(spark, pts)
    assert got == []


def test_roster_cap_fails_loud(spark):
    pts = [_pt(u, 0, 10.5, 20.5) for u in range(10)]
    pts += [_pt(u, 1, 10.5, 20.5) for u in range(10)]
    with pytest.raises(Exception, match="max_members"):
        _run(spark, pts, max_members=5)


def _mirror(pts, res=1.0, min_size=2, min_buckets=2):
    import math

    obs = set()
    cols = int(360 / res)
    for uid, ts, lon, lat in pts:
        x = int(math.floor((lon + 180.0) / res))
        y = int(math.floor((lat + 90.0) / res))
        cell = y * cols + x
        bk = int(ts.timestamp() * 1_000_000) // 3_600_000_000
        obs.add((uid, bk, cell))
    roster = {}
    for uid, bk, cell in obs:
        roster.setdefault((bk, cell), set()).add(uid)
    byk = {}
    for (bk, cell), mem in roster.items():
        if len(mem) < min_size:
            continue
        key = (cell, ",".join(str(u) for u in sorted(mem)))
        byk.setdefault(key, []).append(bk)
    out = []
    for (cell, mem), bks in byk.items():
        bks.sort()
        run = [bks[0]]
        for b in bks[1:]:
            if b == run[-1] + 1:
                run.append(b)
            else:
                if len(run) >= min_buckets:
                    out.append((mem, mem.count(",") + 1,
                                run[0], len(run)))
                run = [b]
        if len(run) >= min_buckets:
            out.append((mem, mem.count(",") + 1,
                        run[0], len(run)))
    return sorted(out)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(88)
    pts = []
    for uid in range(14):
        for h in range(20):
            if rng.random() < 0.75:
                # few cells so rosters repeat
                lon = 10.5 + rng.randrange(0, 2)
                lat = 20.5 + rng.randrange(0, 2)
                pts.append(_pt(uid, h, lon, lat))
    got = _run(spark, pts)
    assert got == _mirror(pts)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(user_id BIGINT, ts TIMESTAMP, "
        "lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", pts)
    rows = con.execute(spatial.flock_groups_sql(
        "t", "user_id", "ts", res_deg=1.0, window_s=3600
    )).fetchall()
    twin = sorted(
        (r[1], r[2], r[3], r[5]) for r in rows
    )
    assert twin == got

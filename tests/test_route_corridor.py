"""Corridor filter (spatial.route_corridor) — planted on/near/far
points against a simple route, endpoint clamping, the exact
threshold boundary, radius guard, random ≡ mirror ≡ twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("corridor-tests", master="local[4]",
                    shuffle_partitions=8)


P_SCHEMA = "point_id long, lon double, lat double"
S_SCHEMA = ("seg_id long, lon1 double, lat1 double, "
            "lon2 double, lat2 double")


def _run(spark, pts, segs, res=0.25, radius=0.0625):
    p = spark.createDataFrame(pts, P_SCHEMA)
    s = spark.createDataFrame(segs, S_SCHEMA)
    out = spatial.route_corridor(p, s, res, radius).collect()
    return {r.point_id: (r.seg_id, r.d2_q) for r in out}


def _mirror(pts, segs, res=0.25, radius=0.0625,
            scale=10_000, d2_scale=1000):
    import math

    def r2i(v):
        # HALF_UP like Spark/DuckDB ROUND (Python round is banker's)
        return int(math.floor(v * scale + 0.5))

    g = int(res * scale)
    thr = int(radius * scale) ** 2 * d2_scale
    out = {}
    for pid, lon, lat in pts:
        px, py = r2i(lon), r2i(lat)
        best = None
        for sid, lo1, la1, lo2, la2 in segs:
            x1, y1 = r2i(lo1), r2i(la1)
            x2, y2 = r2i(lo2), r2i(la2)
            # candidate rule: segment bbox cells ∩ 3×3 probe
            cx0, cx1 = (min(x1, x2) + 180 * scale) // g, \
                (max(x1, x2) + 180 * scale) // g
            cy0, cy1 = (min(y1, y2) + 90 * scale) // g, \
                (max(y1, y2) + 90 * scale) // g
            pcx, pcy = (px + 180 * scale) // g, (py + 90 * scale) // g
            if not (cx0 <= pcx + 1 and cx1 >= pcx - 1
                    and cy0 <= pcy + 1 and cy1 >= pcy - 1):
                continue
            apx, apy = px - x1, py - y1
            abx, aby = x2 - x1, y2 - y1
            dot = apx * abx + apy * aby
            ab2 = abx * abx + aby * aby
            if ab2 == 0 or dot <= 0:
                d2 = (apx * apx + apy * apy) * d2_scale
            elif dot >= ab2:
                d2 = ((px - x2) ** 2 + (py - y2) ** 2) * d2_scale
            else:
                ap2 = apx * apx + apy * apy
                d2 = (ap2 * ab2 - dot * dot) * d2_scale // ab2
            if best is None or (d2, sid) < (best[1], best[0]):
                best = (sid, d2)
        if best is not None and best[1] <= thr:
            out[pid] = best
    return out


ROUTE = [(0, 0.0, 0.0, 1.0, 0.0), (1, 1.0, 0.0, 1.0, 1.0)]


def test_on_near_far(spark):
    pts = [
        (0, 0.5, 0.0),       # on the route → d2 0
        (1, 0.5, 0.05),      # 0.05° off → inside r=0.0625
        (2, 0.5, 0.2),       # 0.2° off → outside
        (3, 1.05, 0.5),      # near the vertical leg
    ]
    got = _run(spark, pts, ROUTE)
    assert got[0] == (0, 0)
    assert got[1][0] == 0 and got[1][1] == 500 ** 2 * 1000
    assert 2 not in got
    assert got[3][0] == 1


def test_endpoint_clamp(spark):
    # beyond the last vertex: distance is to the endpoint, not the
    # infinite line
    pts = [(0, 1.03, 1.04)]   # 3-4-5: d = 0.05° past the endpoint
    got = _run(spark, pts, ROUTE)
    assert got[0] == (1, (300 ** 2 + 400 ** 2) * 1000)
    pts = [(0, 1.0, 1.08)]    # 0.08 past → d=800 > 625 → out
    assert _run(spark, pts, ROUTE) == {}


def test_exact_threshold_boundary(spark):
    # d exactly r: 0.0625° = 625 units → d2_q = 625²·1000 = thr → IN
    pts = [(0, 0.5, 0.0625)]
    got = _run(spark, pts, ROUTE)
    assert got[0] == (0, 625 ** 2 * 1000)


def test_radius_guard(spark):
    with pytest.raises(ValueError, match="one-cell"):
        spatial.route_corridor(None, None, 0.25, 0.5)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(808)
    segs = []
    for i in range(10):
        x, y = rng.randrange(20), rng.randrange(20)
        segs.append((i, x * 1.0, y * 1.0,
                     x + rng.choice([0.5, 1.0]), y * 1.0))
    pts = [
        (i, rng.randrange(20) + rng.randrange(16) * 0.0625,
         rng.randrange(20) + rng.choice([0.0, 0.03125, 0.125, 0.5]))
        for i in range(200)
    ]
    got = _run(spark, pts, segs)
    assert got == _mirror(pts, segs)
    con = duckdb.connect()
    con.execute("CREATE TABLE p(point_id BIGINT, lon DOUBLE, "
                "lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pts)
    con.execute("CREATE TABLE s(seg_id BIGINT, lon1 DOUBLE, "
                "lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?, ?, ?)", segs)
    out = con.execute(spatial.route_corridor_sql(
        "p", "s", 0.25, 0.0625
    )).fetchall()
    assert {r[0]: (r[1], r[2]) for r in out} == got

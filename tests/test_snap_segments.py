"""Point-to-segment snapping (spatial.snap_to_segments) — exact
region cases (interior projection / clamped endpoints / degenerate),
bounded search radius, tie-breaks, and Python + DuckDB twin parity on
random layers."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("snap-tests", master="local[4]", shuffle_partitions=8)


SCALE = 10_000
RES = 1.0
G = int(RES * SCALE)
D2S = 1000


def _snap_python(points, segs):
    """Ground truth: same quantization, same candidate rule, same
    one-shot quantized rational distance, same tie-break."""
    def q(lon, lat):
        return (round(lon * SCALE) + 180 * SCALE,
                round(lat * SCALE) + 90 * SCALE)

    best = {}
    for pid, plon, plat in points:
        px, py = q(plon, plat)
        pcx, pcy = px // G, py // G
        probe = {
            (pcy + dy) * 1_000_000 + (pcx + dx)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        }
        for sid, lo1, la1, lo2, la2 in segs:
            sx1, sy1 = q(lo1, la1)
            sx2, sy2 = q(lo2, la2)
            cover = {
                yy * 1_000_000 + xx
                for yy in range(min(sy1, sy2) // G,
                                max(sy1, sy2) // G + 1)
                for xx in range(min(sx1, sx2) // G,
                                max(sx1, sx2) // G + 1)
            }
            if not (probe & cover):
                continue
            apx, apy = px - sx1, py - sy1
            abx, aby = sx2 - sx1, sy2 - sy1
            dot = apx * abx + apy * aby
            ab2 = abx * abx + aby * aby
            ap2 = apx * apx + apy * apy
            bp2 = (px - sx2) ** 2 + (py - sy2) ** 2
            if ab2 == 0 or dot <= 0:
                d2q = ap2 * D2S
            elif dot >= ab2:
                d2q = bp2 * D2S
            else:
                d2q = (ap2 * ab2 - dot * dot) * D2S // ab2
            key = (d2q, sid)
            if pid not in best or key < best[pid]:
                best[pid] = key
    return {p: (s, d) for p, (d, s) in best.items()}


def _run(spark, points, segs):
    p = spark.createDataFrame(
        points, "point_id string, lon double, lat double"
    )
    s = spark.createDataFrame(
        segs, "seg_id string, lon1 double, lat1 double, "
              "lon2 double, lat2 double"
    )
    return {
        r.point_id: (r.seg_id, r.d2_q)
        for r in spatial.snap_to_segments(p, s, res_deg=RES).collect()
    }


def test_interior_projection_exact(spark):
    """Point above a horizontal segment: interior region, exact
    perpendicular distance (0.1° = 1000 units → d² = 10⁶·D2S)."""
    got = _run(
        spark,
        [("p", 10.5, 20.1)],
        [("s", 10.0, 20.0, 11.0, 20.0)],
    )
    assert got["p"] == ("s", 1000 * 1000 * D2S)


def test_endpoint_clamp(spark):
    """Point beyond the B end snaps at distance |BP|, not the
    infinite-line foot."""
    got = _run(
        spark,
        [("p", 11.3, 20.4)],
        [("s", 10.0, 20.0, 11.0, 20.0)],
    )
    want = (3000 ** 2 + 4000 ** 2) * D2S  # 3-4-5 from B
    assert got["p"] == ("s", want)


def test_degenerate_zero_length(spark):
    got = _run(
        spark,
        [("p", 5.0, 5.0)],
        [("s", 5.0, 5.1, 5.0, 5.1)],
    )
    assert got["p"] == ("s", 1000 * 1000 * D2S)


def test_nearest_wins_and_ties_break_low_id(spark):
    got = _run(
        spark,
        [("p", 0.0, 0.0)],
        [
            ("far", 0.0, 0.5, 1.0, 0.5),
            ("near", 0.0, 0.2, 1.0, 0.2),
            ("near2", 0.0, -0.2, 1.0, -0.2),  # same distance as near
        ],
    )
    assert got["p"] == ("near", 2000 * 2000 * D2S)


def test_out_of_radius_unmatched(spark):
    """A segment > one cell away is never a candidate — the point is
    absent from the output (bounded-radius non-match)."""
    got = _run(
        spark,
        [("p", 0.0, 0.0)],
        [("s", 50.0, 50.0, 51.0, 50.0)],
    )
    assert got == {}


def test_random_layer_vs_python_and_duckdb(spark):
    rng = random.Random(555)
    points = [
        (f"p{i}", rng.uniform(-20, 20), rng.uniform(-20, 20))
        for i in range(80)
    ]
    segs = [
        (
            f"s{i}",
            x := rng.uniform(-22, 22),
            y := rng.uniform(-22, 22),
            x + rng.uniform(-3, 3),
            y + rng.uniform(-3, 3),
        )
        for i in range(60)
    ]
    want = _snap_python(points, segs)
    got = _run(spark, points, segs)
    assert got == want and len(got) > 25

    con = duckdb.connect()
    con.execute("CREATE TABLE pts (point_id VARCHAR, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", points)
    con.execute(
        "CREATE TABLE segs (seg_id VARCHAR, lon1 DOUBLE, lat1 DOUBLE, "
        "lon2 DOUBLE, lat2 DOUBLE)"
    )
    con.executemany("INSERT INTO segs VALUES (?, ?, ?, ?, ?)", segs)
    twin = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            spatial.snap_to_segments_sql("pts", "segs", res_deg=RES)
        ).fetchall()
    }
    assert twin == want

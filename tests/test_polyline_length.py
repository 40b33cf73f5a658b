"""Great-circle length (operators/spatial.py haversine_km /
polyline_length): known geodesic distances, python-reference parity,
scaled-int determinism across parallelism."""

import math
import random

import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("polyline-tests", master="local[4]", shuffle_partitions=8)
    yield s


def ref_haversine(lon1, lat1, lon2, lat2):
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * spatial.EARTH_RADIUS_KM * math.asin(math.sqrt(min(a, 1.0)))


def _dist(spark, lon1, lat1, lon2, lat2):
    df = spark.createDataFrame(
        [(lon1, lat1, lon2, lat2)],
        "lon1 double, lat1 double, lon2 double, lat2 double",
    )
    return df.select(
        spatial.haversine_km(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
        ).alias("d")
    ).collect()[0].d


def test_known_distances(spark):
    # 1 degree of longitude along the equator
    assert _dist(spark, 0.0, 0.0, 1.0, 0.0) == pytest.approx(
        2 * math.pi * spatial.EARTH_RADIUS_KM / 360, rel=1e-12
    )
    # pole to pole: half the great circle
    assert _dist(spark, 13.0, -90.0, 13.0, 90.0) == pytest.approx(
        math.pi * spatial.EARTH_RADIUS_KM, rel=1e-12
    )
    # antipodal (asin clamp path): half circumference
    assert _dist(spark, 0.0, 0.0, 180.0, 0.0) == pytest.approx(
        math.pi * spatial.EARTH_RADIUS_KM, rel=1e-12
    )
    assert _dist(spark, 7.0, 7.0, 7.0, 7.0) == 0.0


def test_matches_python_reference(spark):
    rng = random.Random(23)
    rows = [
        (rng.uniform(-180, 180), rng.uniform(-90, 90),
         rng.uniform(-180, 180), rng.uniform(-90, 90))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        rows, "lon1 double, lat1 double, lon2 double, lat2 double"
    )
    got = [
        r.d
        for r in df.select(
            spatial.haversine_km(
                F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
            ).alias("d")
        ).collect()
    ]
    for g, row in zip(got, rows):
        assert g == pytest.approx(ref_haversine(*row), rel=1e-12)


def test_polyline_length_and_determinism(spark):
    rng = random.Random(31)
    pts = []
    for gid in ("a", "b"):
        for i in range(50):
            pts.append((gid, i, rng.uniform(-180, 180), rng.uniform(-90, 90)))
    pts.append(("single", 0, 10.0, 10.0))
    want = {}
    for gid in ("a", "b"):
        seq = [p for p in pts if p[0] == gid]
        ukm = sum(
            round(ref_haversine(p1[2], p1[3], p2[2], p2[3]) * 1e6)
            for p1, p2 in zip(seq, seq[1:])
        )
        want[gid] = (len(seq) - 1, ukm / 1e6)
    want["single"] = (0, 0.0)

    base = spark.createDataFrame(
        pts, "gid string, ord int, lon double, lat double"
    )
    for parts in (1, 7):
        out = {
            r.gid: (r.n_segments, r.length_km)
            for r in spatial.polyline_length(
                base.repartition(parts), id_col="gid", order_col="ord"
            ).collect()
        }
        assert set(out) == set(want)
        for gid in want:
            assert out[gid][0] == want[gid][0], gid
            assert out[gid][1] == pytest.approx(want[gid][1], abs=2e-6), gid
    # exact equality across parallelism (the scaled-int claim)
    one = spatial.polyline_length(base.repartition(1), "gid", "ord").collect()
    many = spatial.polyline_length(base.repartition(13), "gid", "ord").collect()
    assert sorted((r.gid, r.length_km) for r in one) == \
        sorted((r.gid, r.length_km) for r in many)

"""Geohash / quadkey string encodings (operators/spatial.py geohash,
quadkey): published test vectors, a pure bit-at-a-time reference
implementation, prefix properties, and DuckDB twin parity."""

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("geocode-tests", master="local[4]", shuffle_partitions=4)
    yield s


def ref_geohash(lon, lat, precision):
    """Independent reference: the textbook interval-halving encoder."""
    chars = []
    lon_lo, lon_hi, lat_lo, lat_hi = -180.0, 180.0, -90.0, 90.0
    even = True  # lon bit first
    bit, digit = 0, 0
    while len(chars) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                digit = digit * 2 + 1
                lon_lo = mid
            else:
                digit = digit * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                digit = digit * 2 + 1
                lat_lo = mid
            else:
                digit = digit * 2
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            chars.append(spatial.GEOHASH_BASE32[digit])
            bit, digit = 0, 0
    return "".join(chars)


def ref_quadkey(lon, lat, level):
    x = min(max(int((lon + 180.0) * (65536.0 / 360.0)), 0), 65535)
    y = min(max(int((lat + 90.0) * (65536.0 / 180.0)), 0), 65535)
    digits = []
    for l in range(1, level + 1):
        shift = 16 - l
        digits.append(str((((y >> shift) & 1) << 1) | ((x >> shift) & 1)))
    return "".join(digits)


def _spark_encode(spark, pts, col):
    df = spark.createDataFrame(pts, "lon double, lat double")
    return [r.g for r in df.select(col.alias("g")).collect()]


def test_published_vectors(spark):
    # Wikipedia's worked example: (42.605, -5.603) -> ezs42
    vecs = [
        ((-5.6, 42.6), 5, "ezs42"),
        ((10.40744, 57.64911), 6, "u4pruy"),
        ((-0.1, 51.5), 4, "gcpu"),
    ]
    for (lon, lat), p, want in vecs:
        assert ref_geohash(lon, lat, p) == want  # reference sanity
        got = _spark_encode(
            spark, [(lon, lat)], spatial.geohash(F.col("lon"), F.col("lat"), p)
        )
        assert got == [want], (lon, lat, p)


def test_geohash_matches_reference_all_precisions(spark):
    rng = random.Random(7)
    pts = [(rng.uniform(-180, 179.99), rng.uniform(-90, 89.99))
           for _ in range(200)]
    for p in (1, 2, 3, 4, 5, 6):
        got = _spark_encode(
            spark, pts, spatial.geohash(F.col("lon"), F.col("lat"), p)
        )
        want = [ref_geohash(lon, lat, p) for lon, lat in pts]
        assert got == want, f"precision {p}"


def test_quadkey_matches_reference_and_prefix(spark):
    rng = random.Random(13)
    pts = [(rng.uniform(-180, 179.99), rng.uniform(-90, 89.99))
           for _ in range(200)]
    prev = None
    for level in (1, 5, 6, 16):
        got = _spark_encode(
            spark, pts, spatial.quadkey(F.col("lon"), F.col("lat"), level)
        )
        want = [ref_quadkey(lon, lat, level) for lon, lat in pts]
        assert got == want, f"level {level}"
        if prev is not None:
            assert all(g.startswith(p_) for g, p_ in zip(got, prev))
        prev = got


def test_geohash_prefix_property(spark):
    rng = random.Random(29)
    pts = [(rng.uniform(-180, 179.99), rng.uniform(-90, 89.99))
           for _ in range(100)]
    g6 = _spark_encode(spark, pts,
                       spatial.geohash(F.col("lon"), F.col("lat"), 6))
    for p in (1, 3, 5):
        gp = _spark_encode(spark, pts,
                           spatial.geohash(F.col("lon"), F.col("lat"), p))
        assert [g[:p] for g in g6] == gp


def test_sql_twins_match(spark):
    rng = random.Random(41)
    pts = [(rng.uniform(-180, 179.99), rng.uniform(-90, 89.99))
           for _ in range(300)]
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    for p in (2, 3, 5):
        sql = con.execute(
            f"SELECT {spatial.geohash_sql('lon', 'lat', p)} FROM pts"
        ).fetchall()
        got = _spark_encode(
            spark, pts, spatial.geohash(F.col("lon"), F.col("lat"), p)
        )
        assert [r[0] for r in sql] == got, f"geohash p={p}"
    sql = con.execute(
        f"SELECT {spatial.quadkey_sql('lon', 'lat', 7)} FROM pts"
    ).fetchall()
    got = _spark_encode(
        spark, pts, spatial.quadkey(F.col("lon"), F.col("lat"), 7)
    )
    assert [r[0] for r in sql] == got


def test_bounds_validation():
    with pytest.raises(ValueError):
        spatial.geohash(F.lit(0.0), F.lit(0.0), 7)
    with pytest.raises(ValueError):
        spatial.geohash(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        spatial.quadkey(F.lit(0.0), F.lit(0.0), 17)
    with pytest.raises(ValueError):
        spatial.quadkey_sql("lon", "lat", 0)

"""Ripley's K pair counts (spatial.ripley_k_counts) — planted
clustered vs dispersed patterns, cumulative-band semantics, radius
validation, antimeridian wrap, and DuckDB twin parity (naive O(n²))
on random point sets."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ripley-tests", master="local[4]",
                    shuffle_partitions=8)


RADII = [250_000, 500_000, 1_000_000, 2_000_000]


def _python(points, radii=RADII):
    ids = sorted(points)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            (lon1, lat1), (lon2, lat2) = points[a], points[b]
            dl = abs(lon1 - lon2)
            dl = min(dl, 360.0 - dl)
            d2 = dl * dl + (lat1 - lat2) ** 2
            pairs.append(d2)
    return [
        (r, sum(1 for d2 in pairs if d2 <= (r / 1e6) ** 2), len(ids))
        for r in radii
    ]


def _spark(spark, points, radii=RADII, res_deg=2.0):
    df = spark.createDataFrame(
        [(k, lon, lat) for k, (lon, lat) in points.items()],
        "url string, lon double, lat double",
    )
    rows = spatial.ripley_k_counts(
        df, radii, res_deg=res_deg
    ).collect()
    return sorted((r["r_udeg"], r["n_pairs"], r["n_points"])
                  for r in rows)


def test_planted_bands(spark):
    """Three points at exact offsets: 0.2° pair is in every band,
    0.8° pair only from the 1° band on; bands are cumulative."""
    pts = {"a": (10.0, 10.0), "b": (10.2, 10.0), "c": (10.0, 10.8)}
    got = _spark(spark, pts)
    # d(a,b)=0.2, d(a,c)=0.8, d(b,c)=sqrt(0.04+0.64)~0.825
    assert got == [
        (250_000, 1, 3), (500_000, 1, 3),
        (1_000_000, 3, 3), (2_000_000, 3, 3),
    ]


def test_coincident_points_count(spark):
    pts = {"a": (5.0, 5.0), "b": (5.0, 5.0)}
    got = _spark(spark, pts)
    assert got[0] == (250_000, 1, 2)


def test_antimeridian_pair(spark):
    pts = {"a": (179.9, 0.0), "b": (-179.9, 0.0)}
    got = _spark(spark, pts)
    assert got == [
        (250_000, 1, 2), (500_000, 1, 2),
        (1_000_000, 1, 2), (2_000_000, 1, 2),
    ]


def test_validation(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 0.0)], "url string, lon double, lat double"
    )
    with pytest.raises(ValueError, match="radius"):
        spatial.ripley_k_counts(df, [2_000_000], res_deg=0.5)
    with pytest.raises(ValueError, match="ascending"):
        spatial.ripley_k_counts(df, [500_000, 500_000])
    with pytest.raises(ValueError, match="at least one"):
        spatial.ripley_k_counts(df, [])


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(1212)
    pts = {}
    for i in range(120):
        pts[f"p{i:03d}"] = (
            rng.uniform(-5.0, 5.0), rng.uniform(40.0, 50.0)
        )
    want = sorted(_python(pts))
    assert _spark(spark, pts) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE pts (url VARCHAR, lon DOUBLE, lat DOUBLE)")
    con.executemany(
        "INSERT INTO pts VALUES (?, ?, ?)",
        [(k, lon, lat) for k, (lon, lat) in pts.items()],
    )
    got = sorted(
        tuple(r) for r in con.execute(
            spatial.ripley_k_sql("pts", RADII)
        ).fetchall()
    )
    assert got == want

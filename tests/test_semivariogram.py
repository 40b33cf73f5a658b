"""Empirical semivariogram (spatial.semivariogram_counts) — planted
smooth-gradient vs white-noise value fields, NON-cumulative band
semantics with coincident pairs in band 1, validation, antimeridian
wrap, and DuckDB twin parity (naive O(n²)) on random valued points."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("semivariogram-tests", master="local[4]",
                    shuffle_partitions=8)


EDGES = [250_000, 500_000, 1_000_000, 2_000_000]


def _python(points, edges=EDGES):
    ids = sorted(points)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            (lon1, lat1, v1), (lon2, lat2, v2) = points[a], points[b]
            dl = abs(lon1 - lon2)
            dl = min(dl, 360.0 - dl)
            d2 = dl * dl + (lat1 - lat2) ** 2
            pairs.append((d2, (v1 - v2) ** 2))
    out = []
    lo = [0.0] + [(r / 1e6) ** 2 for r in edges[:-1]]
    hi = [(r / 1e6) ** 2 for r in edges]
    for i, r in enumerate(edges):
        if i == 0:
            band = [s for d2, s in pairs if d2 <= hi[0]]
        else:
            band = [s for d2, s in pairs if lo[i] < d2 <= hi[i]]
        out.append((r, len(band), sum(band), len(ids)))
    return out


def _spark(spark, points, edges=EDGES, res_deg=2.0):
    df = spark.createDataFrame(
        [(k, lon, lat, v) for k, (lon, lat, v) in points.items()],
        "url string, lon double, lat double, v bigint",
    )
    rows = spatial.semivariogram_counts(
        df, edges, "v", res_deg=res_deg
    ).collect()
    return sorted(
        (r["band_udeg"], r["n_pairs"], r["sum_sq_diff"], r["n_points"])
        for r in rows
    )


def test_planted_bands_non_cumulative(spark):
    """Pairs land in exactly ONE band: d(a,b)=0.2 → band 1 only,
    d(a,c)=0.8 and d(b,c)≈0.825 → band 3 only."""
    pts = {
        "a": (10.0, 10.0, 5),
        "b": (10.2, 10.0, 8),   # (5-8)^2 = 9
        "c": (10.0, 10.8, 1),   # (5-1)^2 = 16, (8-1)^2 = 49
    }
    assert _spark(spark, pts) == [
        (250_000, 1, 9, 3),
        (500_000, 0, 0, 3),
        (1_000_000, 2, 65, 3),
        (2_000_000, 0, 0, 3),
    ]


def test_coincident_pair_in_band_one(spark):
    pts = {"a": (5.0, 5.0, 10), "b": (5.0, 5.0, 4)}
    got = _spark(spark, pts)
    assert got[0] == (250_000, 1, 36, 2)
    assert got[1:] == [
        (500_000, 0, 0, 2), (1_000_000, 0, 0, 2), (2_000_000, 0, 0, 2)
    ]


def test_antimeridian_pair(spark):
    pts = {"a": (179.9, 0.0, 3), "b": (-179.9, 0.0, 7)}
    got = _spark(spark, pts)
    assert got[0] == (250_000, 1, 16, 2)


def test_gradient_vs_noise_structure(spark):
    """Planted STRUCTURAL separation: a value field that is a linear
    function of longitude has short-range squared differences strictly
    smaller per pair than long-range ones (γ grows with h); assigning
    the same multiset of values by a hash shuffle destroys the
    distance dependence (per-pair mean is flat within a wide factor).
    The separation is structural — gradient per-pair means differ by
    the square of the band-distance ratio, not a tuned threshold."""
    grad, noise = {}, {}
    for i in range(60):
        lon = -3.0 + (i % 12) * 0.5
        lat = 44.0 + (i // 12) * 0.5
        grad[f"g{i:02d}"] = (lon, lat, round((lon + 3.0) * 100))
        noise[f"n{i:02d}"] = (lon, lat, round(((i * 37) % 12) * 50))
    for pts in (grad, noise):
        got = _spark(spark, pts, res_deg=2.0)
        assert got == sorted(_python(pts))
    g = {r: (n, s) for r, n, s, _ in _python(grad)}
    short_mean = g[500_000][1] / g[500_000][0]
    long_mean = g[2_000_000][1] / g[2_000_000][0]
    assert long_mean > 4 * short_mean


def test_validation(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 0.0, 1)], "url string, lon double, lat double, v bigint"
    )
    with pytest.raises(ValueError, match="probe"):
        spatial.semivariogram_counts(df, [2_000_000], "v", res_deg=0.5)
    with pytest.raises(ValueError, match="ascending"):
        spatial.semivariogram_counts(df, [500_000, 500_000], "v")
    with pytest.raises(ValueError, match="at least one"):
        spatial.semivariogram_counts(df, [], "v")


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(4141)
    pts = {}
    for i in range(110):
        pts[f"p{i:03d}"] = (
            rng.uniform(-5.0, 5.0),
            rng.uniform(40.0, 50.0),
            rng.randrange(0, 1000),
        )
    want = sorted(_python(pts))
    assert _spark(spark, pts) == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts (url VARCHAR, lon DOUBLE, lat DOUBLE, v BIGINT)"
    )
    con.executemany(
        "INSERT INTO pts VALUES (?, ?, ?, ?)",
        [(k, lon, lat, v) for k, (lon, lat, v) in pts.items()],
    )
    got = sorted(
        tuple(r) for r in con.execute(
            spatial.semivariogram_sql("pts", EDGES, "v")
        ).fetchall()
    )
    assert got == want

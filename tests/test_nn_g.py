"""Empirical G function (spatial.nn_g_counts) — lattice step CDF,
cluster-vs-sparse contrast, exact censoring, radius validation,
random ≡ brute mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gfun-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "doc_id long, lon double, lat double"


def _run(spark, pts, radii, delta=1.0):
    df = spark.createDataFrame(pts, SCHEMA)
    out = spatial.nn_g_counts(df, delta, radii).collect()
    return {r.radius_q: (r.n, r.n_matched, r.n_far, r.n_le, r.g_ppm)
            for r in out}


def _mirror(pts, radii, delta=1.0, scale=10_000):
    q = [(i, round(lon * scale) + 180 * scale,
          round(lat * scale) + 90 * scale) for i, lon, lat in pts]
    g = int(delta * scale)
    nn = {}
    for i, x, y in q:
        best = None
        for j, x2, y2 in q:
            if i == j:
                continue
            d2 = (x - x2) ** 2 + (y - y2) ** 2
            if d2 <= g * g and (best is None or d2 < best):
                best = d2
    # NOTE: mirror intentionally brute-forces within the radius
        if best is not None:
            nn[i] = best
    n = len(q)
    out = {}
    for r in sorted(set(radii)):
        le = sum(1 for v in nn.values() if v <= r * r)
        out[r] = (n, len(nn), n - len(nn), le,
                  (le * 10**6) // n if n else None)
    return out


def test_lattice_step_cdf(spark):
    # 0.5°-spaced row: every NN distance is exactly 5000 q-units →
    # G jumps from 0 to 1e6 at r = 5000
    pts = [(i, i * 0.5, 0.0) for i in range(6)]
    got = _run(spark, pts, [4999, 5000, 9000])
    assert got[4999][3] == 0 and got[4999][4] == 0
    assert got[5000][3] == 6 and got[5000][4] == 10**6
    assert got == _mirror(pts, [4999, 5000, 9000])


def test_cluster_vs_sparse_and_censoring(spark):
    # a tight pair + an isolate beyond the probe radius: the isolate
    # is censored into n_far and no band ever counts it
    pts = [(1, 0.0, 0.0), (2, 0.01, 0.0), (3, 50.0, 0.0)]
    got = _run(spark, pts, [200, 5000])
    assert got[200] == (3, 2, 1, 2, 666_666)
    assert got[5000] == (3, 2, 1, 2, 666_666)
    assert got == _mirror(pts, [200, 5000])


def test_radius_validation(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], SCHEMA)
    with pytest.raises(ValueError, match="3x3-probe"):
        spatial.nn_g_counts(df, 1.0, [20_000])
    with pytest.raises(ValueError, match="radii_q"):
        spatial.nn_g_counts(df, 1.0, [])


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(11)
    pts = [
        (i, rng.uniform(-10, 10), rng.uniform(-10, 10))
        for i in range(120)
    ]
    radii = [500, 2000, 5000, 10_000]
    got = _run(spark, pts, radii)
    assert got == _mirror(pts, radii)
    assert got[10_000][3] > got[500][3]   # the CDF actually climbs

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p(doc_id BIGINT, lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pts)
    out = con.execute(
        spatial.nn_g_counts_sql("p", 1.0, radii)
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got


def test_all_censored_bands_are_zero_not_null(spark):
    """Degenerate case (round-6 fix): no point has a neighbour within
    delta — every band count must be 0 (matching the twin's
    COALESCE(SUM(...), 0)), never NULL."""
    pts = [(1, 0.0, 0.0), (2, 50.0, 0.0), (3, -50.0, 40.0)]
    got = _run(spark, pts, [2500, 5000])
    for r in (2500, 5000):
        n, n_matched, n_far, n_le, g_ppm = got[r]
        assert (n, n_matched, n_far) == (3, 0, 3)
        assert n_le == 0          # was NULL before the coalesce fix
        assert g_ppm == 0         # 0 * 1e6 DIV 3

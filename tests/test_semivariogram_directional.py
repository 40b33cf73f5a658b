"""Directional semivariogram (spatial.semivariogram_directional) —
anisotropic plant (EW structure ≠ NS structure), exact 45° sector
boundaries, sector sums reproduce the isotropic operator, wrap
orientation, random ≡ Python mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial
from openstreetmap_license_change_spark.operators.spatial import (
    SV_SECTORS as SECTORS,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("svdir-tests", master="local[4]",
                    shuffle_partitions=8)


EDGES = [500_000, 1_000_000]


def _run(spark, pts):
    df = spark.createDataFrame(
        pts, "cell long, lon double, lat double, v long"
    )
    out = spatial.semivariogram_directional(
        df, EDGES, "v", id_col="cell", res_deg=1.0
    ).collect()
    return {(r.band_udeg, r.sector): (r.n_pairs, r.sum_sq_diff)
            for r in out}


def _sector(dlon, dlat):
    if dlon < 0:
        dlon, dlat = -dlon, -dlat
    if dlat >= 0 and dlat < dlon:
        return "D0_45"
    if dlat >= 0:
        return "D45_90"
    if -dlat >= dlon:
        return "D90_135"
    return "D135_180"


def _mirror(pts):
    out = {(r, s): [0, 0] for r in EDGES
           for s in SECTORS}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = pts[i], pts[j]
            if a[0] > b[0]:
                a, b = b, a
            raw = b[1] - a[1]
            dlon = raw - 360.0 if raw > 180.0 else (
                raw + 360.0 if raw < -180.0 else raw)
            dlat = b[2] - a[2]
            d2 = dlon * dlon + dlat * dlat
            sec = _sector(dlon, dlat)
            prev = 0.0
            for r in EDGES:
                hi = (r / 1e6) ** 2
                if prev < d2 <= hi or (prev == 0.0 and d2 == 0.0):
                    out[(r, sec)][0] += 1
                    out[(r, sec)][1] += (a[3] - b[3]) ** 2
                    break
                prev = hi
    return {k: tuple(v) for k, v in out.items()}


def test_anisotropic_plant(spark):
    # a row of varying values (EW pairs differ) and a column of
    # constant values (NS pairs identical): γ_EW > 0, γ_NS = 0
    pts = [(i, 10.0 + 0.4 * i, 20.0, 10 * i) for i in range(4)]
    pts += [(100 + i, 50.0, -5.0 + 0.4 * i, 7) for i in range(4)]
    got = _run(spark, pts)
    # row pairs (θ=0) land in D0_45 with real variance; the pure-
    # north column pairs land in D45_90 (inclusive θ=90 edge) with
    # zero variance — the anisotropy is visible per sector
    ew = sum(got[(r, "D0_45")][1] for r in EDGES)
    ns = sum(got[(r, "D45_90")][1] for r in EDGES)
    ns_n = sum(got[(r, "D45_90")][0] for r in EDGES)
    assert ew > 0 and ns == 0 and ns_n > 0


def test_exact_45_degree_boundary(spark):
    # dlat == dlon exactly → 'NE' by the ≥ rule, not 'EW'
    pts = [(1, 0.0, 0.0, 0), (2, 0.3, 0.3, 5)]
    got = _run(spark, pts)
    assert got[(500_000, "D45_90")] == (1, 25)
    assert got[(500_000, "D0_45")] == (0, 0)


def test_sectors_sum_to_isotropic(spark):
    rng = random.Random(11)
    pts = [(i, 30.0 + rng.random(), 40.0 + rng.random(),
            rng.randrange(0, 50)) for i in range(40)]
    df = spark.createDataFrame(
        pts, "cell long, lon double, lat double, v long"
    )
    iso = {
        r.band_udeg: (r.n_pairs, r.sum_sq_diff)
        for r in spatial.semivariogram_counts(
            df, EDGES, "v", id_col="cell", res_deg=1.0
        ).collect()
    }
    got = _run(spark, pts)
    for r in EDGES:
        n = sum(got[(r, s)][0] for s in SECTORS)
        sq = sum(got[(r, s)][1] for s in SECTORS)
        assert (n, sq) == iso[r]


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(2024)
    pts = [
        (i, -179.9 + rng.random() * 0.8 if i % 3 == 0
         else 100.0 + rng.random(),
         10.0 + rng.random(),
         rng.randrange(0, 100))
        for i in range(35)
    ]
    # add antimeridian neighbors so the signed wrap path runs
    pts += [(500, 179.95, 10.5, 3), (501, -179.95, 10.4, 9)]
    got = _run(spark, pts)
    assert got == _mirror(pts)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(cell BIGINT, lon DOUBLE, lat DOUBLE, "
        "v BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", pts)
    rows = con.execute(spatial.semivariogram_directional_sql(
        "t", EDGES, "v", id_col="cell"
    )).fetchall()
    assert {(r[0], r[1]): (r[2], r[3]) for r in rows} == got

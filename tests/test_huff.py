"""Huff market shares (spatial.huff_shares) — equidistant equal
split, attractiveness doubles share, inverse-square deterrence,
on-site clamp dominates, radius truncation visible, shares sum ≤
10⁶, random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("huff-tests", master="local[4]",
                    shuffle_partitions=8)


PTS = "doc_id long, lon double, lat double"
SITES = "site_id long, lon double, lat double, attract long"


def _run(spark, pts, sites, radius=1.0):
    out = spatial.huff_shares(
        spark.createDataFrame(pts, PTS),
        spark.createDataFrame(sites, SITES),
        radius,
    ).collect()
    return sorted(
        (r.doc_id, r.site_id, r.d2_q, r.n_sites, r.share_ppm)
        for r in out
    )


def _mirror(pts, sites, radius=1.0, scale=10_000, u_scale=10**12):
    def q(v, off):
        s = v * scale
        return (int(s + 0.5) if s >= 0 else -int(-s + 0.5)) + off

    d2max = int(round(radius * scale)) ** 2
    out = []
    for i, plo, pla in pts:
        px, py = q(plo, 180 * scale), q(pla, 90 * scale)
        cand = []
        for s, slo, sla, a in sites:
            sx, sy = q(slo, 180 * scale), q(sla, 90 * scale)
            d2 = (px - sx) ** 2 + (py - sy) ** 2
            if d2 <= d2max:
                cand.append((s, d2, (a * u_scale) // max(d2, 1)))
        du = sum(u for _, _, u in cand)
        for s, d2, u in cand:
            out.append((i, s, d2, len(cand), (u * 10**6) // du))
    return sorted(out)


def test_equidistant_equal_split(spark):
    sites = [(1, -0.5, 0.0, 10), (2, 0.5, 0.0, 10)]
    pts = [(7, 0.0, 0.0)]
    got = _run(spark, pts, sites)
    assert [r[4] for r in got] == [500_000, 500_000]


def test_attractiveness_doubles_share(spark):
    sites = [(1, -0.5, 0.0, 20), (2, 0.5, 0.0, 10)]
    pts = [(7, 0.0, 0.0)]
    got = _run(spark, pts, sites)
    shares = {r[1]: r[4] for r in got}
    assert shares[1] == 666_666 and shares[2] == 333_333
    assert got == _mirror(pts, sites)


def test_inverse_square_deterrence(spark):
    # site 2 is twice as far → quarter the utility
    sites = [(1, 0.1, 0.0, 10), (2, 0.2, 0.0, 10)]
    pts = [(7, 0.0, 0.0)]
    got = _run(spark, pts, sites)
    shares = {r[1]: r[4] for r in got}
    assert shares[1] == 800_000 and shares[2] == 200_000
    assert got == _mirror(pts, sites)


def test_on_site_clamp_dominates(spark):
    sites = [(1, 0.0, 0.0, 1), (2, 0.5, 0.0, 10**6)]
    pts = [(7, 0.0, 0.0)]
    got = _run(spark, pts, sites)
    shares = {r[1]: r[4] for r in got}
    # d² clamps to 1 quantum: u₁ = 10⁶ vs u₂ = 10¹²/25·10⁶ = 4·10⁴
    assert shares[1] > 900_000
    assert got == _mirror(pts, sites)


def test_radius_truncation_visible(spark):
    sites = [(1, 0.1, 0.0, 10), (2, 5.0, 0.0, 10**6)]
    pts = [(7, 0.0, 0.0)]
    got = _run(spark, pts, sites, radius=1.0)
    assert len(got) == 1 and got[0][3] == 1
    assert got[0][4] == 1_000_000


def test_shares_sum_bounded(spark):
    rng = random.Random(11)
    sites = [(s, rng.uniform(-1, 1), rng.uniform(-1, 1),
              rng.randrange(1, 50)) for s in range(7)]
    pts = [(7, 0.0, 0.0)]
    got = _run(spark, pts, sites, radius=4.0)
    tot = sum(r[4] for r in got)
    assert 10**6 - len(got) <= tot <= 10**6


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(7272)
    sites = [(s, rng.uniform(-3, 3), rng.uniform(-3, 3),
              rng.randrange(1, 100)) for s in range(15)]
    pts = [(i, rng.uniform(-3, 3), rng.uniform(-3, 3))
           for i in range(60)]
    got = _run(spark, pts, sites, radius=1.0)
    assert got == _mirror(pts, sites, radius=1.0)
    con = duckdb.connect()
    con.execute("CREATE TABLE p(doc_id BIGINT, lon DOUBLE, "
                "lat DOUBLE)")
    con.execute("CREATE TABLE s(site_id BIGINT, lon DOUBLE, "
                "lat DOUBLE, attract BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pts)
    con.executemany("INSERT INTO s VALUES (?, ?, ?, ?)", sites)
    out = con.execute(spatial.huff_shares_sql(
        "p", "s", 1.0
    )).fetchall()
    assert sorted(tuple(r) for r in out) == got

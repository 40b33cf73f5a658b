"""LCSS track similarity (spatial.lcss_pairs) — identical tracks,
disjoint tracks, detour robustness vs EDR, the Vlachos warp window,
order enforcement (crossing matches), random ≡ DP mirror ≡
anti-diagonal twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("lcss-tests", master="local[4]",
                    shuffle_partitions=8)


PTS_SCHEMA = "entity long, seq long, lon double, lat double"
PAIR_SCHEMA = "id_a long, id_b long"


def _run(spark, pts, pairs, eps=0.1, delta=None, max_points=16):
    p = spark.createDataFrame(pts, PTS_SCHEMA)
    q = spark.createDataFrame(pairs, PAIR_SCHEMA)
    out = spatial.lcss_pairs(
        p, q, eps=eps, delta=delta, max_points=max_points
    ).collect()
    return sorted(
        (r.id_a, r.id_b, r.n_a, r.n_b, r.lcss_q, r.sim_ppm)
        for r in out
    )


def _mirror(pts, pairs, eps=0.1, delta=None, scale=10**6):
    def q(v):
        s = v * scale
        return int(s + 0.5) if s >= 0 else -int(-s + 0.5)

    eps_q2 = int(round(eps * scale)) ** 2
    tracks = {}
    for e, s, lo, la in pts:
        tracks.setdefault(e, []).append((s, q(lo), q(la)))
    for e in tracks:
        tracks[e].sort()
    out = []
    for a, b in pairs:
        ta = [(x, y) for _, x, y in tracks[a]]
        tb = [(x, y) for _, x, y in tracks[b]]
        n, m = len(ta), len(tb)
        dp = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                d2 = ((ta[i - 1][0] - tb[j - 1][0]) ** 2
                      + (ta[i - 1][1] - tb[j - 1][1]) ** 2)
                match = d2 <= eps_q2 and (
                    delta is None or abs((i - 1) - (j - 1)) <= delta
                )
                dp[i][j] = max(
                    dp[i - 1][j - 1] + (1 if match else 0),
                    dp[i - 1][j], dp[i][j - 1],
                )
        lc = dp[n][m]
        out.append((a, b, n, m, lc, (lc * 10**6) // min(n, m)))
    return sorted(out)


def _track(e, coords):
    return [(e, i, x, y) for i, (x, y) in enumerate(coords)]


def test_identical_tracks(spark):
    coords = [(0.0, 0.0), (1.0, 0.5), (2.0, 1.0), (3.0, 1.5)]
    pts = _track(1, coords) + _track(2, coords)
    got = _run(spark, pts, [(1, 2)])
    assert got == [(1, 2, 4, 4, 4, 1_000_000)]


def test_disjoint_tracks(spark):
    pts = _track(1, [(0.0, 0.0), (1.0, 0.0)]) \
        + _track(2, [(50.0, 50.0), (51.0, 50.0)])
    assert _run(spark, pts, [(1, 2)]) == [(1, 2, 2, 2, 0, 0)]


def test_detour_skipped_not_charged(spark):
    # B follows A's corridor at fixes 0, 2, 4 but detours wildly at
    # 1 and 3 — LCSS counts the 3-chain and SKIPS the junk (EDR
    # would charge each junk fix an edit).
    a = [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (4.0, 0.0)]
    b = [(0.0, 0.0), (80.0, 40.0), (2.0, 0.0), (-80.0, 40.0),
         (4.0, 0.0)]
    pts = _track(1, a) + _track(2, b)
    got = _run(spark, pts, [(1, 2)], eps=0.05)
    assert got == [(1, 2, 5, 5, 3, 600_000)]
    assert got == _mirror(pts, [(1, 2)], eps=0.05)


def test_warp_window_forbids_shifted_matches(spark):
    # B is A shifted by 3 positions: every match needs |i-j| = 3.
    a = [(float(i), 0.0) for i in range(10)]
    b = [(float(i + 3), 0.0) for i in range(10)]
    pts = _track(1, a) + _track(2, b)
    unwindowed = _run(spark, pts, [(1, 2)], eps=0.05)
    assert unwindowed == [(1, 2, 10, 10, 7, 700_000)]
    windowed = _run(spark, pts, [(1, 2)], eps=0.05, delta=2)
    assert windowed == [(1, 2, 10, 10, 0, 0)]
    assert windowed == _mirror(pts, [(1, 2)], eps=0.05, delta=2)


def test_order_enforced_crossing_matches(spark):
    # A = [P, Q], B = [Q, P]: both points match pairwise but a chain
    # may use only one (order-preserving), so lcss = 1.
    pts = _track(1, [(0.0, 0.0), (5.0, 5.0)]) \
        + _track(2, [(5.0, 5.0), (0.0, 0.0)])
    got = _run(spark, pts, [(1, 2)], eps=0.05)
    assert got == [(1, 2, 2, 2, 1, 500_000)]


def test_validation(spark):
    pts = _track(1, [(0.0, 0.0)]) + _track(2, [(0.0, 0.0)])
    with pytest.raises(ValueError, match="eps"):
        _run(spark, pts, [(1, 2)], eps=0.0)
    with pytest.raises(ValueError, match="delta"):
        _run(spark, pts, [(1, 2)], delta=-1)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(7171)
    pts = []
    for e in range(10):
        npts = rng.randrange(2, 9)
        pts += _track(e, [
            (rng.randrange(-8, 9) * 0.25, rng.randrange(-8, 9) * 0.25)
            for _ in range(npts)
        ])
    pairs = [(a, b) for a in range(10) for b in range(a + 1, 10)]
    got = _run(spark, pts, pairs, eps=0.3, delta=2)
    assert got == _mirror(pts, pairs, eps=0.3, delta=2)
    con = duckdb.connect()
    con.execute("CREATE TABLE p(entity BIGINT, seq BIGINT, "
                "lon DOUBLE, lat DOUBLE)")
    con.execute("CREATE TABLE q(id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?, ?)", pts)
    con.executemany("INSERT INTO q VALUES (?, ?)", pairs)
    out = con.execute(spatial.lcss_pairs_sql(
        "p", "q", eps=0.3, delta=2, max_points=8
    )).fetchall()
    assert sorted(tuple(r) for r in out) == got

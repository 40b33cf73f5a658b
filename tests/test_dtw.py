"""DTW pairs (spatial.dtw_pairs) — closed-form planted alignments,
accumulation-vs-leash separation from Fréchet, the loud path-sum
overflow bound, Python DP mirror + anti-diagonal DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("dtw-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, points, pairs, **kw):
    pdf = spark.createDataFrame(
        points, "entity bigint, seq bigint, lon double, lat double"
    )
    prdf = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    out = spatial.dtw_pairs(pdf, prdf, **kw).collect()
    return {
        (r.id_a, r.id_b): (r.n_a, r.n_b, r.dtw_q) for r in out
    }


def _python_dp(a, b):
    n, m = len(a), len(b)
    d = [
        [(ax - bx) ** 2 + (ay - by) ** 2 for bx, by in b]
        for ax, ay in a
    ]
    dp = [[0] * m for _ in range(n)]
    dp[0][0] = d[0][0]
    for i in range(1, n):
        dp[i][0] = dp[i - 1][0] + d[i][0]
    for j in range(1, m):
        dp[0][j] = dp[0][j - 1] + d[0][j]
    for i in range(1, n):
        for j in range(1, m):
            dp[i][j] = d[i][j] + min(
                dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
            )
    return dp[n - 1][m - 1]


def _python_mirror(points, pairs, scale=1_000_000):
    by_e = {}
    for e, s, lon, lat in points:
        by_e.setdefault(e, []).append(
            (s, round(lon * scale), round(lat * scale))
        )
    out = {}
    for a, b in pairs:
        ta = [(x, y) for _, x, y in sorted(by_e[a])]
        tb = [(x, y) for _, x, y in sorted(by_e[b])]
        out[(a, b)] = (len(ta), len(tb), _python_dp(ta, tb))
    return out


def test_identical_tracks_zero(spark):
    pts = [(e, i, i * 1e-5, 0.0) for e in (1, 2) for i in range(6)]
    got = _run(spark, pts, [(1, 2)])
    assert got[(1, 2)] == (6, 6, 0)


def test_parallel_offset_accumulates(spark):
    """B is A shifted 3 µdeg north: Fréchet's leash is 9, but DTW
    SUMS the 9 over every matched step — n aligned cells, no warp
    helps, total 5·9 = 45."""
    pts = [(1, i, i * 1e-6, 0.0) for i in range(5)] + [
        (2, i, i * 1e-6, 3e-6) for i in range(5)
    ]
    got = _run(spark, pts, [(1, 2)])
    assert got[(1, 2)] == (5, 5, 45)
    fr = spatial.frechet_pairs(
        spark.createDataFrame(
            pts, "entity bigint, seq bigint, lon double, lat double"
        ),
        spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint"),
    ).collect()[0]
    assert fr.frechet_q == 9


def test_time_stretch_is_cheap(spark):
    """B revisits each point of A twice (time-axis stretch): DTW
    warps the duplicate onto the same A point for free, so the
    distance stays 0 — the property Fréchet shares but a lockstep
    sum-of-squares would not."""
    pts = [(1, i, i * 1e-6, 0.0) for i in range(4)] + [
        (2, j, (j // 2) * 1e-6, 0.0) for j in range(8)
    ]
    got = _run(spark, pts, [(1, 2)])
    assert got[(1, 2)] == (4, 8, 0)


def test_single_point_tracks(spark):
    pts = [(1, 0, 0.0, 0.0), (2, 0, 2e-6, 0.0)]
    got = _run(spark, pts, [(1, 2)])
    assert got[(1, 2)] == (1, 1, 4)


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(23)
    points = []
    for e in range(6):
        for s in range(rng.randrange(3, 13)):
            points.append((
                e, s,
                rng.randrange(0, 3000) * 1e-6,
                rng.randrange(0, 3000) * 1e-6,
            ))
    pairs = [(0, 1), (2, 3), (4, 5), (1, 4)]
    got = _run(spark, points, pairs)
    want = _python_mirror(points, pairs)
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts(entity BIGINT, seq BIGINT, lon DOUBLE, "
        "lat DOUBLE)"
    )
    con.executemany("INSERT INTO pts VALUES (?, ?, ?, ?)", points)
    con.execute("CREATE TABLE prs(id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO prs VALUES (?, ?)", pairs)
    got_sql = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(
            spatial.dtw_pairs_sql("pts", "prs", max_points=16)
        ).fetchall()
    }
    assert got == got_sql


def test_max_points_guard_fires(spark):
    pts = [(1, i, i * 1e-6, 0.0) for i in range(10)] + [
        (2, 0, 0.0, 0.0)
    ]
    pdf = spark.createDataFrame(
        pts, "entity bigint, seq bigint, lon double, lat double"
    )
    prdf = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    with pytest.raises(Exception, match="max_points"):
        spatial.dtw_pairs(pdf, prdf, max_points=5).collect()


def test_path_sum_overflow_is_loud(spark):
    """Two antipodal 3-point tracks at scale=1e6: max d² ≈ 1.6e17,
    (n+m−1)=5 cells → 8e17 < 2⁶³, fine; but at the guard boundary a
    planted monster must raise, not wrap.  Force it with max-span
    coordinates and enough points."""
    n = 30
    pts = [(1, i, -180.0, -89.0) for i in range(n)] + [
        (2, i, 180.0, 89.0) for i in range(n)
    ]
    pdf = spark.createDataFrame(
        pts, "entity bigint, seq bigint, lon double, lat double"
    )
    prdf = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    with pytest.raises(Exception, match="overflows int64"):
        spatial.dtw_pairs(pdf, prdf, max_points=64).collect()


def test_params_validated(spark):
    with pytest.raises(ValueError):
        spatial.dtw_pairs_sql("p", "q", max_points=128)

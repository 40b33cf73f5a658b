"""EDR pairs (spatial.edr_pairs) — outlier robustness vs DTW/Fréchet,
ε-match semantics, virtual empty-prefix edges, Python DP mirror +
anti-diagonal DuckDB twin parity (border COALESCE terms)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("edr-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, points, pairs, **kw):
    pdf = spark.createDataFrame(
        points, "entity bigint, seq bigint, lon double, lat double"
    )
    prdf = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    out = spatial.edr_pairs(pdf, prdf, **kw).collect()
    return {
        (r.id_a, r.id_b): (r.n_a, r.n_b, r.edr_q) for r in out
    }


def _python_dp(a, b, eps_q2):
    n, m = len(a), len(b)

    def cost(i, j):
        return int(
            (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
            > eps_q2
        )

    # Full (n+1)×(m+1) formulation with explicit empty-prefix edges —
    # deliberately a DIFFERENT shape from the operator's n×m grid.
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = i
    for j in range(m + 1):
        dp[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = min(
                dp[i - 1][j - 1] + cost(i - 1, j - 1),
                dp[i - 1][j] + 1,
                dp[i][j - 1] + 1,
            )
    return dp[n][m]


def _python_mirror(points, pairs, eps=1e-4, scale=1_000_000):
    eps_q2 = round(eps * scale) ** 2
    by_e = {}
    for e, s, lon, lat in points:
        by_e.setdefault(e, []).append(
            (s, round(lon * scale), round(lat * scale))
        )
    out = {}
    for a, b in pairs:
        ta = [(x, y) for _, x, y in sorted(by_e[a])]
        tb = [(x, y) for _, x, y in sorted(by_e[b])]
        out[(a, b)] = (len(ta), len(tb), _python_dp(ta, tb, eps_q2))
    return out


def test_identical_tracks_zero(spark):
    pts = [(e, i, i * 1e-3, 0.0) for e in (1, 2) for i in range(6)]
    got = _run(spark, pts, [(1, 2)])
    assert got[(1, 2)] == (6, 6, 0)


def test_one_glitch_costs_one(spark):
    """B equals A except point 2 jumped a whole degree: EDR charges
    exactly 1 edit while DTW pays the full squared jump — the
    outlier-robustness separation the trio exists to offer."""
    pts = [(1, i, i * 1e-3, 0.0) for i in range(5)]
    pts += [(2, i, i * 1e-3 if i != 2 else 1.0, 0.0)
            for i in range(5)]
    got = _run(spark, pts, [(1, 2)])
    assert got[(1, 2)] == (5, 5, 1)
    dtw = spatial.dtw_pairs(
        spark.createDataFrame(
            pts, "entity bigint, seq bigint, lon double, lat double"
        ),
        spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint"),
    ).collect()[0]
    # the warp routes the glitch to A's nearest point (lon 0.004):
    assert dtw.dtw_q >= (1_000_000 - 4_000) ** 2


def test_offset_within_eps_is_free(spark):
    pts = [(1, i, i * 1e-3, 0.0) for i in range(4)] + [
        (2, i, i * 1e-3, 5e-5) for i in range(4)
    ]
    got = _run(spark, pts, [(1, 2)], eps=1e-4)
    assert got[(1, 2)] == (4, 4, 0)


def test_offset_beyond_eps_substitutes_all(spark):
    pts = [(1, i, i * 1e-3, 0.0) for i in range(4)] + [
        (2, i, i * 1e-3, 3e-4) for i in range(4)
    ]
    got = _run(spark, pts, [(1, 2)], eps=1e-4)
    assert got[(1, 2)] == (4, 4, 4)


def test_extra_points_cost_insertions(spark):
    """B is A with two far-away points appended: 2 insertions."""
    pts = [(1, i, i * 1e-3, 0.0) for i in range(4)]
    pts += [(2, i, i * 1e-3, 0.0) for i in range(4)]
    pts += [(2, 4, 0.5, 0.5), (2, 5, 0.6, 0.6)]
    got = _run(spark, pts, [(1, 2)])
    assert got[(1, 2)] == (4, 6, 2)


def test_single_point_tracks(spark):
    pts = [(1, 0, 0.0, 0.0), (2, 0, 2e-3, 0.0)]
    got = _run(spark, pts, [(1, 2)])
    assert got[(1, 2)] == (1, 1, 1)


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(29)
    points = []
    for e in range(6):
        for s in range(rng.randrange(3, 13)):
            points.append((
                e, s,
                rng.randrange(0, 12) * 1e-4,
                rng.randrange(0, 12) * 1e-4,
            ))
    pairs = [(0, 1), (2, 3), (4, 5), (1, 4)]
    got = _run(spark, points, pairs, eps=2e-4)
    want = _python_mirror(points, pairs, eps=2e-4)
    assert got == want
    assert any(v[2] > 0 for v in got.values())
    assert any(
        v[2] < max(v[0], v[1]) for v in got.values()
    ), "eps too tight to exercise matches"

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
            spatial.edr_pairs_sql(
                "pts", "prs", eps=2e-4, max_points=16
            )
        ).fetchall()
    }
    assert got == got_sql


def test_params_validated(spark):
    with pytest.raises(ValueError, match="eps"):
        spatial.edr_pairs_sql("p", "q", eps=0.0)
    with pytest.raises(ValueError, match="max_points"):
        spatial.edr_pairs_sql("p", "q", max_points=128)

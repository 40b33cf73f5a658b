"""Symmetric Hausdorff pairs (spatial.hausdorff_pairs) — planted
asymmetric point sets with closed-form directed distances, duplicate
collapse, the loud max_points guard, Python mirror + DuckDB twin
parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hausdorff-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, points, pairs, **kw):
    pdf = spark.createDataFrame(
        points, "entity bigint, lon double, lat double"
    )
    prdf = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    out = spatial.hausdorff_pairs(pdf, prdf, **kw).collect()
    return {
        (r.id_a, r.id_b): (r.n_a, r.n_b, r.h_ab_q, r.h_ba_q,
                           r.hausdorff_q)
        for r in out
    }


def test_asymmetric_directed_distances(spark):
    """A = {0, 1e-6}, B = {0, 1e-6, 11e-6} on the lon axis: every A
    point sits on a B point (h_ab = 0) but B's outlier is 10 µdeg
    from A (h_ba = 100); symmetric H takes the max."""
    points = [(1, 0.0, 0.0), (1, 1e-6, 0.0),
              (2, 0.0, 0.0), (2, 1e-6, 0.0), (2, 11e-6, 0.0)]
    got = _run(spark, points, [(1, 2)])
    assert got[(1, 2)] == (2, 3, 0, 100, 100)


def test_identical_sets_zero(spark):
    points = [(1, 1.0, 2.0), (1, 3.0, 4.0),
              (2, 1.0, 2.0), (2, 3.0, 4.0)]
    got = _run(spark, points, [(1, 2)])
    assert got[(1, 2)] == (2, 2, 0, 0, 0)


def test_duplicates_collapse(spark):
    """Repeated coordinates are one point — n counts distinct and the
    max-min is unchanged."""
    points = [(1, 0.0, 0.0)] * 5 + [(2, 2e-6, 0.0)] * 3
    got = _run(spark, points, [(1, 2)])
    assert got[(1, 2)] == (1, 1, 4, 4, 4)


def test_only_candidate_pairs_emitted(spark):
    points = [(1, 0.0, 0.0), (2, 0.0, 0.0), (3, 0.0, 0.0)]
    got = _run(spark, points, [(1, 2)])
    assert set(got) == {(1, 2)}


def _python_mirror(points, pairs, scale=1_000_000):
    by_e = {}
    for e, lon, lat in points:
        by_e.setdefault(e, set()).add(
            (round(lon * scale), round(lat * scale))
        )
    out = {}
    for a, b in pairs:
        pa, pb = by_e[a], by_e[b]

        def h(src, dst):
            return max(
                min((sx - dx) ** 2 + (sy - dy) ** 2
                    for dx, dy in dst)
                for sx, sy in src
            )

        hab, hba = h(pa, pb), h(pb, pa)
        out[(a, b)] = (len(pa), len(pb), hab, hba, max(hab, hba))
    return out


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(6)
    points = []
    for e in range(6):
        base_lon = -100 + e * 0.01
        for _ in range(rng.randrange(5, 25)):
            points.append((
                e,
                base_lon + rng.randrange(0, 2000) * 1e-6,
                -45.0 + rng.randrange(0, 2000) * 1e-6,
            ))
    pairs = [(0, 1), (2, 3), (4, 5), (0, 5)]
    got = _run(spark, points, pairs)
    want = _python_mirror(points, pairs)
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts(entity BIGINT, lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", points)
    con.execute("CREATE TABLE prs(id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO prs VALUES (?, ?)", pairs)
    got_sql = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(
            spatial.hausdorff_pairs_sql("pts", "prs")
        ).fetchall()
    }
    assert got == got_sql


def test_max_points_guard_fires(spark):
    points = [(1, i * 1e-6, 0.0) for i in range(10)] + [(2, 0.0, 0.0)]
    pdf = spark.createDataFrame(
        points, "entity bigint, lon double, lat double"
    )
    prdf = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    with pytest.raises(Exception, match="max_points"):
        spatial.hausdorff_pairs(pdf, prdf, max_points=5).collect()


def test_scale_validated(spark):
    with pytest.raises(ValueError):
        spatial.hausdorff_pairs_sql("p", "q", scale=10_000_000)

"""Convex hulls (operators/hull.py): exact monotone-chain hulls vs a
brute-force membership check, degenerate shapes, and the containment
property linking the directional-extremes sketch to the exact hull.
"""

import itertools

import pytest

from openstreetmap_license_change_spark.operators import hull, textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hull-tests", master="local[4]", shuffle_partitions=8)


def _hull(spark, pts):
    df = spark.createDataFrame(
        [(1, x, y) for x, y in pts], "gid long, lon double, lat double"
    )
    return sorted(
        (r["ulon"], r["ulat"]) for r in hull.convex_hull(df, "gid").collect()
    )


def test_square_with_midpoints_and_interior(spark):
    """Collinear edge midpoints and interior points are not vertices."""
    pts = [
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),   # corners
        (0.5, 0.0), (1.0, 0.5), (0.5, 1.0), (0.0, 0.5),   # edge midpoints
        (0.5, 0.5), (0.25, 0.75),                          # interior
    ]
    assert _hull(spark, pts) == [
        (0, 0), (0, 10000), (10000, 0), (10000, 10000)
    ]


def test_all_collinear_keeps_endpoints(spark):
    pts = [(0.0, 0.0), (0.1, 0.1), (0.2, 0.2), (0.3, 0.3)]
    assert _hull(spark, pts) == [(0, 0), (3000, 3000)]


def test_degenerate_small_groups(spark):
    assert _hull(spark, [(2.0, 3.0)]) == [(20000, 30000)]
    assert _hull(spark, [(2.0, 3.0), (2.0, 3.0)]) == [(20000, 30000)]
    assert _hull(spark, [(0.0, 0.0), (1.0, 2.0)]) == [(0, 0), (10000, 20000)]


def _brute_vertices(pts):
    """Minimal hull vertices via the witness-edge rule (the oracle's
    characterization, in Python)."""
    def cross(p, q, r):
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])

    def between(p, q, r):
        d = (r[0] - p[0]) * (q[0] - p[0]) + (r[1] - p[1]) * (q[1] - p[1])
        l2 = (q[0] - p[0]) ** 2 + (q[1] - p[1]) ** 2
        return 0 < d < l2

    out = []
    for p in pts:
        if len(pts) == 1:
            out.append(p)
            continue
        for q in pts:
            if q == p:
                continue
            ok = all(
                cross(p, q, r) > 0
                or (cross(p, q, r) == 0 and between(p, q, r))
                for r in pts if r not in (p, q)
            )
            if ok:
                out.append(p)
                break
    return sorted(out)


def test_random_clouds_match_witness_rule(spark):
    """Deterministic pseudo-random clouds: the chain agrees with the
    independent witness-edge characterization."""
    pts = sorted(
        set(
            ((i * 7919 % 101) / 100.0, (i * 104729 % 97) / 100.0)
            for i in range(40)
        )
    )
    got = _hull(spark, pts)
    want = _brute_vertices([(round(x * 10000), round(y * 10000))
                            for x, y in pts])
    assert got == want


def test_extremes_are_hull_vertices(spark):
    """Every directional-extreme point is an exact hull vertex, and
    the 4 axis-aligned extremes always exist."""
    pts = [
        ((i * 31 % 23) / 10.0, (i * 57 % 29) / 10.0) for i in range(30)
    ]
    df = spark.createDataFrame(
        [(1, x, y) for x, y in pts], "gid long, lon double, lat double"
    )
    hv = set(
        (r["ulon"], r["ulat"]) for r in hull.convex_hull(df, "gid").collect()
    )
    ext = hull.directional_extremes(df, "gid").collect()
    assert len(ext) == 8
    for r in ext:
        assert (r["ulon"], r["ulat"]) in hv


def test_canonical_url_unit_cases(spark):
    cases = [
        ("HTTP://Example.COM:80/A/b?utm_source=x&b=2&a=1#frag",
         "http://example.com/A/b?a=1&b=2"),
        ("https://Host.org:443/", "https://host.org/"),
        ("https://host.org/p?utm_campaign=z", "https://host.org/p"),
        ("http://h.io/p", "http://h.io/p"),
        ("http://h.io/p?z=1&y=2&fbclid=abc", "http://h.io/p?y=2&z=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    import pyspark.sql.functions as F

    got = [r["c"] for r in
           df.select(textops.canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]

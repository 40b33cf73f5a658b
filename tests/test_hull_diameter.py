"""Per-group farthest pair (hull.hull_diameter) — hand cases with
known diameters, the hull-vs-raw-scan equivalence property (the
diameter of the hull IS the diameter of the set), the loud h² guard,
and DuckDB twin parity on random groups."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import hull


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hull-diameter-tests", master="local[4]",
                    shuffle_partitions=8)


def _u(v):
    """degrees → snapped 10⁻⁴-degree units (round-half-even like the
    operator's F.round, but the tests use exactly representable
    coordinates so plain round is identical)."""
    return round(v * 10_000)


def _python_diameter(pts):
    """pts: [(lon, lat)] degrees → (d2, a, b) with the operator's
    tie-break (max lexicographic (d2, a_ulon, a_ulat, b_ulon, b_ulat),
    pairs ordered a ≤ b)."""
    up = sorted({(_u(x), _u(y)) for x, y in pts})
    best = None
    for i, a in enumerate(up):
        for b in up[i:]:
            d2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
            key = (d2, a[0], a[1], b[0], b[1])
            if best is None or key > best:
                best = key
    return best


def _spark_diameter(spark, groups, **kw):
    rows = [
        (gid, float(x), float(y))
        for gid, pts in groups.items()
        for x, y in pts
    ]
    df = spark.createDataFrame(rows, "gid bigint, lon double, lat double")
    out = hull.hull_diameter(df, "gid", **kw).collect()
    return {
        r["gid"]: (r["d2"], r["a_ulon"], r["a_ulat"],
                   r["b_ulon"], r["b_ulat"])
        for r in out
    }


def test_hand_square(spark):
    """Unit square + interior points: diameter = a main diagonal; the
    tie between the two diagonals breaks to the greater struct."""
    pts = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (0.5, 0.5)]
    got = _spark_diameter(spark, {1: pts})[1]
    assert got == _python_diameter(pts)
    assert got[0] == 2 * 10_000 ** 2


def test_single_point_and_duplicate(spark):
    """One distinct point (possibly duplicated) → d2 = 0, both
    endpoints the point itself."""
    got = _spark_diameter(spark, {7: [(3.0, 4.0), (3.0, 4.0)]})[7]
    assert got == (0, 30_000, 40_000, 30_000, 40_000)


def test_collinear(spark):
    """Collinear points: diameter = the two extremes."""
    pts = [(float(i), float(i)) for i in range(6)]
    got = _spark_diameter(spark, {2: pts})[2]
    assert got == (2 * 50_000 ** 2, 0, 0, 50_000, 50_000)


def test_interior_never_wins(spark):
    """Diameter over the hull equals the brute-force diameter over
    ALL points — random clouds per group."""
    rng = random.Random(515)
    groups = {
        g: [
            (rng.uniform(-50, 50), rng.uniform(-50, 50))
            for _ in range(40)
        ]
        for g in range(4)
    }
    got = _spark_diameter(spark, groups)
    for g, pts in groups.items():
        want = _python_diameter(pts)
        # snap test coords the way the operator does (F.round = half-even)
        assert got[g][0] >= want[0] * 0.999  # guard against snap drift
    # exact check with grid-snapped inputs (no rounding ambiguity)
    groups_i = {
        g: [(round(x, 1), round(y, 1)) for x, y in pts]
        for g, pts in groups.items()
    }
    got_i = _spark_diameter(spark, groups_i)
    for g, pts in groups_i.items():
        assert got_i[g] == _python_diameter(pts)


def test_guard_raises_on_huge_hull(spark):
    """A circle makes every point a hull vertex — the h² guard fires."""
    import math

    pts = [
        (math.cos(2 * math.pi * i / 64), math.sin(2 * math.pi * i / 64))
        for i in range(64)
    ]
    with pytest.raises(Exception, match="max_hull_size"):
        _spark_diameter(spark, {1: pts}, max_hull_size=10)


def test_vs_duckdb_twin(spark):
    rng = random.Random(99)
    groups = {
        g: [
            (round(rng.uniform(-30, 30), 2), round(rng.uniform(-30, 30), 2))
            for _ in range(25)
        ]
        for g in range(3)
    }
    got = _spark_diameter(spark, groups)
    con = duckdb.connect()
    con.execute("CREATE TABLE raw (gid BIGINT, ulon BIGINT, ulat BIGINT)")
    con.executemany(
        "INSERT INTO raw VALUES (?, ?, ?)",
        sorted({
            (g, _u(x), _u(y)) for g, pts in groups.items()
            for x, y in pts
        }),
    )
    twin = {
        r[0]: tuple(r[1:])
        for r in con.execute(hull.hull_diameter_sql("raw")).fetchall()
    }
    assert twin == got

"""One-pass Visvalingam simplification (spatial.simplify_lines)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("simplify-tests", master="local[4]",
                    shuffle_partitions=8)


DDL = "line int, seq int, lon double, lat double"


def test_collinear_interior_dropped_endpoints_kept(spark):
    # a 5-point line: 3 interior points, the middle one exactly on the
    # chord (area 0), the others well off it
    rows = [
        (1, 1, 0.0, 0.0),
        (1, 2, 1.0, 5.0),     # big triangle — survives
        (1, 3, 2.0, 2.0),     # collinear with (1,5) and (3,-1)? no —
        (1, 4, 3.0, -1.0),    # big triangle — survives
        (1, 5, 4.0, 0.0),
        # line 2: perfectly straight — every interior point dropped
        (2, 1, 0.0, 0.0), (2, 2, 1.0, 1.0), (2, 3, 2.0, 2.0),
        (2, 4, 3.0, 3.0),
    ]
    df = spark.createDataFrame(rows, DDL)
    out = spatial.simplify_lines(df, "line", "seq", min_area2=1)
    got = {(r.line, r.seq): r.new_seq for r in out.collect()}
    # straight line collapses to its endpoints
    assert {(l, s) for (l, s) in got if l == 2} == {(2, 1), (2, 4)}
    assert got[(2, 1)] == 1 and got[(2, 4)] == 2
    # endpoints of line 1 always survive
    assert (1, 1) in got and (1, 5) in got


def test_threshold_drops_small_triangles(spark):
    # interior point 1e-4° off the chord: 2A = |(x-px)(ny-py)-(nx-px)(y-py)|
    # with scale 1e4: p=(0,0), q=(1, 0.0001), r=(2, 0) → 2A = 2·1 = 2? —
    # scaled: (10000-0)*(0-0) - (20000-0)*(1-0) = -20000 → 2A = 20000
    rows = [(1, 1, 0.0, 0.0), (1, 2, 1.0, 0.0001), (1, 3, 2.0, 0.0)]
    df = spark.createDataFrame(rows, DDL)
    kept = spatial.simplify_lines(df, "line", "seq", min_area2=20000)
    assert kept.count() == 3  # 2A == threshold → kept (>=)
    kept = spatial.simplify_lines(df, "line", "seq", min_area2=20001)
    assert kept.count() == 2


def test_removed_points_all_below_threshold(spark):
    """One-pass contract: every dropped point's effective area in the
    ORIGINAL line is < threshold, every kept interior point's is ≥."""
    rng = random.Random(5)
    rows = [(l, s, rng.uniform(-180, 180), rng.uniform(-90, 90))
            for l in range(10) for s in range(1, 40)]
    df = spark.createDataFrame(rows, DDL)
    thr = 10**12
    out = spatial.simplify_lines(df, "line", "seq", min_area2=thr)
    kept = {(r.line, r.seq) for r in out.collect()}

    def a2(p, q, r, sc=10_000):
        px, py = round(p[0] * sc), round(p[1] * sc)
        qx, qy = round(q[0] * sc), round(q[1] * sc)
        rx, ry = round(r[0] * sc), round(r[1] * sc)
        return abs((qx - px) * (ry - py) - (rx - px) * (qy - py))

    by_line = {}
    for l, s, x, y in rows:
        by_line.setdefault(l, []).append((s, x, y))
    for l, pts in by_line.items():
        pts.sort()
        for i in range(1, len(pts) - 1):
            area = a2(pts[i - 1][1:], pts[i][1:], pts[i + 1][1:])
            assert ((l, pts[i][0]) in kept) == (area >= thr), (l, i)


def test_duckdb_twin_matches(spark):
    rng = random.Random(9)
    rows = [(l, s, round(rng.uniform(-180, 180), 4),
             round(rng.uniform(-90, 90), 4))
            for l in range(8) for s in range(1, 30)]
    df = spark.createDataFrame(rows, DDL)
    got = sorted(map(tuple,
                     spatial.simplify_lines(df, "line", "seq",
                                            min_area2=10**12).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(line INT, seq INT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    want = sorted(map(tuple, con.execute(
        spatial.simplify_lines_sql("t", "line", "seq", 10**12)
    ).fetchall()))
    assert got == want


def test_single_shuffle_plan(spark):
    df = spark.createDataFrame([(1, 1, 0.0, 0.0)], DDL)
    plan = (
        spatial.simplify_lines(df, "line", "seq", min_area2=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lag/lead window, filter, and renumber window share one exchange
    assert plan.count("Exchange") == 1, plan

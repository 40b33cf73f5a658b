"""Hilbert-curve cell index (operators/hilbert.py): DFA encoder vs the
classic loop, engine parity, curve properties, and the write layout."""

import glob
import math
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import hilbert as H


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hilbert-tests", master="local[4]", shuffle_partitions=8)


def _pts(spark, n=2000, seed=7):
    rng = random.Random(seed)
    rows = [(i, rng.uniform(-180, 180), rng.uniform(-90, 90))
            for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "pid int, lon double, lat double"
    )


def test_curve_is_bijective_and_unit_step():
    """The defining Hilbert properties, exhaustively at order 6:
    d is a bijection onto [0, 4^order) and consecutive ids are
    edge-adjacent cells (Manhattan distance exactly 1) — the locality
    guarantee cluster_by_hilbert's pruning argument rests on."""
    order, n = 6, 1 << 6
    inv = {}
    for x in range(n):
        for y in range(n):
            inv[H.xy2d(order, x, y)] = (x, y)
    assert sorted(inv) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_dfa_tables_reproduce_the_loop():
    """The derived 4-state DFA == the classic mutating loop on random
    (order, x, y) — the import-time derivation is what ships."""
    def dfa(order, x, y):
        s = d = 0
        for i in range(order - 1, -1, -1):
            k = s * 4 + ((x >> i) & 1) * 2 + ((y >> i) & 1)
            d = d * 4 + H._DIGIT_TAB[k]
            s = H._NEXT_TAB[k]
        return d

    rng = random.Random(0)
    for _ in range(3000):
        o = rng.randint(1, 16)
        x, y = rng.randrange(1 << o), rng.randrange(1 << o)
        assert dfa(o, x, y) == H.xy2d(o, x, y)


def test_spark_matches_python_reference(spark):
    rows, df = _pts(spark)
    for order in (4, 9, 16):
        got = {r.pid: r.hcell
               for r in H.with_hilbert(df, order=order).collect()}
        n = 1 << order
        for pid, lon, lat in rows:
            x = min(max(int(math.floor((lon + 180.0) * (n / 360.0))), 0),
                    n - 1)
            y = min(max(int(math.floor((lat + 90.0) * (n / 180.0))), 0),
                    n - 1)
            assert got[pid] == H.xy2d(order, x, y), (order, pid)


def test_duckdb_twin_matches(spark):
    rows, df = _pts(spark, n=800, seed=13)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(pid INT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", rows)
    for order in (3, 16):
        got = {r.pid: r.hcell
               for r in H.with_hilbert(df, order=order).collect()}
        want = dict(
            con.execute(H.hilbert_sql("pts", "pid", order=order)).fetchall()
        )
        assert got == want, order


def test_plan_is_linear_in_order(spark):
    """The DFA chain must stay one projection per level — never the
    4^order closed-form blowup (CollapseProject must not re-inline the
    state column).  Pin an upper bound on the executed-plan text."""
    _, df = _pts(spark, n=10)
    plan = (
        H.with_hilbert(df, order=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(plan) < 40_000, len(plan)


def test_cluster_plan_single_range_exchange(spark):
    _, df = _pts(spark)
    out = H.cluster_by_hilbert(df, order=12, num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(hcell" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_written_files_have_disjoint_hilbert_ranges(spark, tmp_path):
    _, df = _pts(spark, n=4000, seed=3)
    out = str(tmp_path / "hclustered")
    H.cluster_by_hilbert(df, order=12, num_partitions=8).write.parquet(out)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 4
    ranges = sorted(
        tuple(spark.read.parquet(f)
              .agg(F.min("hcell"), F.max("hcell")).collect()[0])
        for f in files
    )
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file hilbert ranges overlap"


def test_hilbert_ranges_are_tighter_than_morton():
    """The quantitative pruning claim, measured the way the layout is
    actually split: range partitioning samples ARBITRARY (unaligned)
    id split points, so compare the mean bounding-box area of random
    unaligned 64-cell id intervals, Hilbert vs Morton, at order 6.
    (Power-of-two-ALIGNED runs are exact subquadrants on both curves
    and tie — the Hilbert win is precisely the unaligned case.)
    Measured: ~93 vs ~170 cells of box per 64 cells of data."""
    order, n = 6, 1 << 6

    def morton(x, y):
        d = 0
        for i in range(order):
            d |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return d

    hinv = {H.xy2d(order, x, y): (x, y)
            for x in range(n) for y in range(n)}
    minv = {morton(x, y): (x, y) for x in range(n) for y in range(n)}

    def area(inv, a, b):
        xs, ys = zip(*(inv[d] for d in range(a, b)))
        return (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)

    rng = random.Random(42)
    starts = [rng.randrange(0, n * n - 64) for _ in range(500)]
    h = sum(area(hinv, a, a + 64) for a in starts)
    m = sum(area(minv, a, a + 64) for a in starts)
    assert h < 0.7 * m, (h / 500, m / 500)


def test_order_bounds():
    with pytest.raises(ValueError):
        H.hilbert_sql("t", "pid", order=17)
    with pytest.raises(ValueError):
        H.hilbert_sql("t", "pid", order=0)


def test_bbox_ranges_cover_exactly_and_are_maximal():
    """Exhaustive at order 5: for random bboxes the decomposed ranges
    cover exactly the bbox's cell ids, are sorted/disjoint, and no two
    adjacent ranges are mergeable (maximality)."""
    order, n = 5, 1 << 5
    ids = {(x, y): H.xy2d(order, x, y) for x in range(n) for y in range(n)}
    rng = random.Random(17)
    for _ in range(60):
        x0 = rng.randrange(n); x1 = rng.randrange(x0, n)
        y0 = rng.randrange(n); y1 = rng.randrange(y0, n)
        ranges = H.hilbert_bbox_ranges(x0, x1, y0, y1, order)
        want = {ids[(x, y)] for x in range(x0, x1 + 1)
                for y in range(y0, y1 + 1)}
        got = {d for lo, hi in ranges for d in range(lo, hi + 1)}
        assert got == want, (x0, x1, y0, y1)
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 + 1 < l2, "ranges not maximal/disjoint"


def test_full_grid_is_one_range():
    assert H.hilbert_bbox_ranges(0, 63, 0, 63, 6) == [(0, 4095)]


def test_range_predicate_prunes_parquet(spark, tmp_path):
    """End-to-end pruning: a bbox predicate built from the range
    decomposition returns exactly the bbox rows over a
    cluster_by_hilbert parquet layout, and the BETWEEN legs reach the
    scan as PushedFilters."""
    rows, df = _pts(spark, n=3000, seed=21)
    out = str(tmp_path / "hlayout")
    H.cluster_by_hilbert(df, order=12, num_partitions=8).write.parquet(out)
    back = spark.read.parquet(out)
    box = (-30.0, 40.0, -20.0, 35.0)  # lon_min, lon_max, lat_min, lat_max
    ranges = H.hilbert_lonlat_ranges(*box, order=12)
    pred = H.hilbert_range_predicate(ranges)
    got = {r.pid for r in back.where(pred).collect()}
    want = {pid for pid, lon, lat in rows
            if box[0] <= lon <= box[1] and box[2] <= lat <= box[3]}
    # ranges cover whole cells, so the pruned set is a superset of the
    # exact box; residual-filter to exact and compare
    assert want <= got
    exact = back.where(pred).where(
        (F.col("lon") >= box[0]) & (F.col("lon") <= box[1])
        & (F.col("lat") >= box[2]) & (F.col("lat") <= box[3])
    )
    assert {r.pid for r in exact.collect()} == want
    plan = back.where(pred)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "hcell" in plan.split(
        "PushedFilters:")[1][:400], plan

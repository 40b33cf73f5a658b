"""STR R-tree bulk packing (operators/rtree.py).

The adaptive spatial write layout: exact two-level global ranks (no
global window), textbook STR semantics verified against the naive
ROW_NUMBER definition in DuckDB.
"""

import collections

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import rtree


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("str-tests", master="local[4]",
                    shuffle_partitions=8)


def _rects(n=500):
    rows = []
    for i in range(n):
        cx = (i * 2654435761) % 100000
        cy = (i * 40503) % 80000
        w, h = (i % 37) + 1, (i % 53) + 1
        rows.append((i, cx - w, cy - h, cx + w, cy + h))
    return rows


SCHEMA = "rect_id bigint, minx bigint, miny bigint, maxx bigint, maxy bigint"


def test_leaf_capacity_and_coverage(spark):
    df = spark.createDataFrame(_rects(), SCHEMA)
    packed = rtree.str_pack(df, leaf_size=32, n_buckets=64)
    stats = rtree.str_leaf_stats(packed).collect()
    assert sum(r.n_rects for r in stats) == 500
    assert max(r.n_rects for r in stats) <= 32
    # P = ceil(500/32) = 16 leaves, all non-empty
    assert len(stats) == 16


def test_hand_computed_tiny_case(spark):
    """9 unit squares on a 3×3 grid, B=3 → S=⌈√3⌉=2: slices cut by
    x-rank into runs of 6, leaves by y within slice."""
    rows = [(3 * gy + gx, 10 * gx, 10 * gy, 10 * gx + 1, 10 * gy + 1)
            for gx in range(3) for gy in range(3)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.rect_id: (r.slice, r.leaf_id)
           for r in rtree.str_pack(df, leaf_size=3, n_buckets=16).collect()}
    # x-ranks: columns gx=0 (ids 0,3,6), gx=1 (1,4,7), gx=2 (2,5,8);
    # slice size = S*B = 6 → slice 0 = columns 0,1; slice 1 = column 2
    for rid in (0, 3, 6, 1, 4, 7):
        assert got[rid][0] == 0
    for rid in (2, 5, 8):
        assert got[rid][0] == 1
    # slice 0 sorted by cy: (0,1) low row, then (3,4), then (6,7) —
    # leaves of 3: {0,1,3}, {4,6,7}
    assert got[0][1] == got[1][1] == got[3][1] == 0
    assert got[4][1] == got[6][1] == got[7][1] == 1
    # slice 1: one leaf (3 rects), id = slice*S + 0 = 2
    assert got[2][1] == got[5][1] == got[8][1] == 2


def test_duckdb_twin_matches_textbook_definition(spark):
    """The two-level rank decomposition must reproduce the global
    ROW_NUMBER definition bit-for-bit — including with heavy center
    TIES (many rects sharing cx/cy, broken by id)."""
    rows = _rects()
    rows += [(1000 + i, 500, 500, 510, 510) for i in range(40)]  # ties
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(map(tuple, rtree.str_leaf_stats(
        rtree.str_pack(df, leaf_size=32, n_buckets=64)).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE TABLE r({SCHEMA.replace(' bigint', ' BIGINT')})")
    con.executemany("INSERT INTO r VALUES (?,?,?,?,?)", rows)
    want = sorted(map(tuple, con.execute(
        rtree.str_pack_sql("SELECT * FROM r", leaf_size=32)).fetchall()))
    assert got == want


def test_packing_quality_beats_id_order(spark):
    """The point of STR: total leaf semi-perimeter must be well below
    arrival-order packing of the same leaf size."""
    rows = _rects()
    df = spark.createDataFrame(rows, SCHEMA)
    stats = rtree.str_leaf_stats(
        rtree.str_pack(df, leaf_size=32, n_buckets=64)).collect()
    str_cost = sum(r.semi_perimeter for r in stats)
    naive = collections.defaultdict(list)
    for i, (rid, mnx, mny, mxx, mxy) in enumerate(rows):
        naive[i // 32].append((mnx, mny, mxx, mxy))
    naive_cost = sum(
        (max(x2 for _, _, x2, _ in v) - min(x1 for x1, _, _, _ in v))
        + (max(y2 for *_, y2 in v) - min(y1 for _, y1, _, _ in v))
        for v in naive.values())
    assert str_cost < naive_cost // 2


def test_skew_guard_raises(spark):
    rows = [(i, 100, 100, 102, 102) for i in range(50)]  # one bucket
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(Exception, match="max_bucket_rows"):
        rtree.str_pack(df, leaf_size=8, n_buckets=16,
                       max_bucket_rows=10).collect()


def test_no_global_window(spark):
    """Every window spec in the plan must be partitioned (bucket or
    slice) — the scalability claim of the two-level rank."""
    df = spark.createDataFrame(_rects(200), SCHEMA)
    plan = rtree.str_pack(df, leaf_size=16, n_buckets=32) \
        ._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert ("windowspecdefinition(_rb#" in line
                    or "windowspecdefinition(slice#" in line), line


def test_params_validated(spark):
    df = spark.createDataFrame(_rects(5), SCHEMA)
    with pytest.raises(ValueError):
        rtree.str_pack(df, leaf_size=0)
    with pytest.raises(ValueError):
        rtree.str_pack(df, n_buckets=1)

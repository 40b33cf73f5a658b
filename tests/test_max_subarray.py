"""Kadane max-subarray fold (temporal.max_subarray) — hand-pinned
runs, restart-on-zero tie rule, first-maximal tie rule, all-negative
and singleton conventions, loud guard, random ≡ scan mirror ≡ DuckDB
prefix-sum twin (different mechanism)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("kadane-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "k string, t long, x long"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.max_subarray(df, "k", "t", "x", **kw).collect()
    return {r.k: (r.best_sum, r.t_start, r.t_end, r.n_points)
            for r in out}


def _mirror(rows):
    by = {}
    for k, t, x in rows:
        by.setdefault(k, []).append((t, x))
    out = {}
    for k, pts in by.items():
        pts.sort()
        best = bs = be = None
        cur, cs = 0, 0
        for i, (t, x) in enumerate(pts, 1):
            if i == 1 or cur <= 0:
                cur, cs = x, i
            else:
                cur += x
            if best is None or cur > best:
                best, bs, be = cur, cs, i
        out[k] = (best, pts[bs - 1][0], pts[be - 1][0], len(pts))
    return out


def test_hand_pinned(spark):
    xs = [-2, 1, -3, 4, -1, 2, 1, -5, 4]   # classic: best = 6 @ [4..7]
    rows = [("a", t, x) for t, x in enumerate(xs)]
    got = _run(spark, rows)
    assert got == {"a": (6, 3, 6, 9)}
    assert got == _mirror(rows)


def test_zero_carry_restarts(spark):
    # [2, -2, 3]: at the 3 the carry is exactly 0 → restart, so the
    # winning run is just [3] starting at t=2, not t=0
    rows = [("z", 0, 2), ("z", 1, -2), ("z", 2, 3)]
    got = _run(spark, rows)
    assert got == {"z": (3, 2, 2, 3)}
    assert got == _mirror(rows)


def test_first_maximal_wins(spark):
    # two disjoint runs both summing 5 → the earlier one is reported
    rows = [("f", 0, 5), ("f", 1, -9), ("f", 2, 5)]
    got = _run(spark, rows)
    assert got == {"f": (5, 0, 0, 3)}
    assert got == _mirror(rows)


def test_all_negative_and_singleton(spark):
    rows = [("n", 0, -7), ("n", 1, -2), ("n", 2, -11), ("s", 5, -4)]
    got = _run(spark, rows)
    assert got["n"] == (-2, 1, 1, 3)
    assert got["s"] == (-4, 5, 5, 1)
    assert got == _mirror(rows)


def test_guard(spark):
    rows = [("g", t, 1) for t in range(10)]
    with pytest.raises(Exception, match="max_points"):
        _run(spark, rows, max_points=5)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(808)
    rows = []
    for k in range(20):
        for t in range(rng.randrange(1, 60)):
            rows.append((f"k{k:02d}", t, rng.randrange(-10, 11)))
    got = _run(spark, rows)
    assert got == _mirror(rows)

    con = duckdb.connect()
    con.execute("CREATE TABLE s(k VARCHAR, t BIGINT, x BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
    out = con.execute(
        temporal.max_subarray_sql("s", "k", "t", "x")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

"""Longest drainage path (spatial.drainage_length) — chain plant with
exact per-position lengths, Y-confluence max semantics, pointer-forest
mirror over the operator's own pointers, random raster ≡ DuckDB twin
(recursive walk vs constant-carry doubling)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("drain-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 1.0
COLS = 360


def _cell(y, x):
    return y * COLS + x


def _run(spark, cells):
    df = spark.createDataFrame(cells, "cell long, v long")
    out = spatial.drainage_length(df, "v", res_deg=RES).collect()
    return {r.cell: (r.d8_cell, r.path_len) for r in out}


def _longest_from_pointers(ptrs):
    """Max hops to each node over the pointer forest."""
    longest = {c: 0 for c in ptrs}
    for start in ptrs:
        d, node = 0, start
        while ptrs.get(node) is not None:
            node = ptrs[node]
            d += 1
            longest[node] = max(longest[node], d)
    return longest


def test_linear_chain(spark):
    # strictly decreasing along a row: pointer i → i+1, len(i) = i
    cells = [(_cell(50, 10 + i), 100 - i) for i in range(6)]
    got = _run(spark, cells)
    for i in range(6):
        assert got[_cell(50, 10 + i)][1] == i


def test_confluence_takes_max(spark):
    # two arms of different length meeting at a mouth
    #   arm A: 3 cells, arm B: 1 cell, mouth below both
    cells = [
        (_cell(10, 10), 90), (_cell(10, 11), 80), (_cell(10, 12), 70),
        (_cell(12, 13), 75),          # short arm (diagonal-adjacent)
        (_cell(11, 12), 60),          # mouth candidate
    ]
    got = _run(spark, cells)
    ptrs = {c: got[c][0] for c in got}
    mirror = _longest_from_pointers(ptrs)
    assert {c: got[c][1] for c in got} == mirror
    # the mouth's longest arm wins (steepest descent may shortcut
    # diagonally, so the main stem here is 2 hops)
    assert max(mirror.values()) >= 2


def test_random_vs_pointer_mirror_and_twin(spark):
    rng = random.Random(808)
    cells = {}
    for _ in range(150):
        y, x = rng.randrange(40, 48), rng.randrange(100, 112)
        cells[_cell(y, x)] = rng.randrange(0, 1000)
    cells = sorted(cells.items())
    got = _run(spark, cells)
    ptrs = {c: got[c][0] for c in got}
    assert {c: got[c][1] for c in got} == _longest_from_pointers(ptrs)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(cell BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cells)
    rows = con.execute(
        spatial.drainage_length_sql("t", "v", res_deg=RES)
    ).fetchall()
    assert {r[0]: (r[2], r[3]) for r in rows} == got


def test_long_chain_exercises_doubling(spark):
    # 33-cell chain: needs ≥ 6 doubling rounds, far past round-robin
    n = 33
    cells = [(_cell(100, 50 + i), 1000 - i) for i in range(n)]
    got = _run(spark, cells)
    assert got[_cell(100, 50 + n - 1)][1] == n - 1

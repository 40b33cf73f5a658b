"""D8 flow direction + accumulation (spatial.flow_direction /
flow_accumulation) — planted slopes/chains/confluences with known
catchments, a plain-Python transitive mirror, and DuckDB twin parity
(recursive-CTE membership vs pointer-jumping bands) on random
terrains."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("flow-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 10.0
COLS, ROWS = 36, 18


def _cell(cx, cy):
    return cy * COLS + cx


def _python_flow(cells, res_deg=RES):
    """cells: {cell: v} → {cell: (v, d8, acc)} by the transitive
    definition (follow pointers from every cell, count memberships)."""
    cols = int(360 / res_deg)
    rows_n = int(180 / res_deg)
    d8 = {}
    for c, v in cells.items():
        cy, cx = divmod(c, cols)
        best = None
        seen = set()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ty, tx = cy + dy, (cx + dx + cols) % cols
                nbr = ty * cols + tx
                if not (0 <= ty < rows_n) or nbr in seen:
                    continue
                seen.add(nbr)
                if nbr in cells and cells[nbr] < v:
                    cand = (v - cells[nbr], -nbr)
                    if best is None or cand > best:
                        best = cand
        d8[c] = -best[1] if best else None
    acc = {c: 0 for c in cells}
    for c in cells:
        cur = d8[c]
        while cur is not None:
            acc[cur] += 1
            cur = d8[cur]
    return {c: (cells[c], d8[c], acc[c]) for c in cells}


def _spark_flow(spark, cells, max_rounds=40):
    df = spark.createDataFrame(
        [(c, v) for c, v in cells.items()], "cell bigint, v bigint"
    )
    rows = spatial.flow_accumulation(
        df, "v", res_deg=RES, max_rounds=max_rounds
    ).collect()
    assert len(rows) == len(cells)
    return {r["cell"]: (r["v"], r["d8_cell"], r["acc"]) for r in rows}


def test_chain_catchments(spark):
    """A monotone 6-cell slope: acc grows 0..5 down the chain, each
    pointer one step east (path length exercises ≥3 doubling rounds)."""
    cells = {_cell(4 + i, 9): 100 - i for i in range(6)}
    got = _spark_flow(spark, cells)
    assert got == _python_flow(cells)
    for i in range(6):
        c = _cell(4 + i, 9)
        assert got[c][2] == i
        assert got[c][1] == (_cell(5 + i, 9) if i < 5 else None)


def test_confluence_sums_branches(spark):
    """Two ridges draining into one valley cell: the mouth's
    catchment is the sum of both branches plus the junction."""
    cells = {
        _cell(5, 5): 50, _cell(6, 5): 40,      # branch A
        _cell(5, 7): 50, _cell(6, 7): 40,      # branch B
        _cell(7, 6): 30,                        # junction (diag from both)
        _cell(8, 6): 20,                        # mouth
    }
    got = _spark_flow(spark, cells)
    assert got == _python_flow(cells)
    assert got[_cell(7, 6)][2] == 4
    assert got[_cell(8, 6)][2] == 5


def test_sink_and_plateau(spark):
    """Equal values never flow (strict descent): an isolated plateau
    pair are both sinks with empty catchments."""
    cells = {_cell(3, 3): 7, _cell(4, 3): 7}
    got = _spark_flow(spark, cells)
    assert got[_cell(3, 3)] == (7, None, 0)
    assert got[_cell(4, 3)] == (7, None, 0)


def test_tiebreak_smallest_neighbor_id(spark):
    """Two neighbors with the identical drop: the pointer goes to the
    smaller cell id, deterministically."""
    c = _cell(10, 10)
    lo_a, lo_b = _cell(9, 9), _cell(11, 9)   # same row above, equal v
    cells = {c: 10, lo_a: 4, lo_b: 4}
    got = _spark_flow(spark, cells)
    assert got[c][1] == min(lo_a, lo_b)
    assert got == _python_flow(cells)


def test_lon_wrap_flow(spark):
    """Flow crosses the antimeridian: cx=0 drains into cx=COLS-1."""
    cells = {_cell(0, 8): 9, _cell(COLS - 1, 8): 2}
    got = _spark_flow(spark, cells)
    assert got[_cell(0, 8)][1] == _cell(COLS - 1, 8)
    assert got[_cell(COLS - 1, 8)][2] == 1


def test_max_rounds_guard(spark):
    cells = {_cell(4 + i, 9): 100 - i for i in range(6)}
    df = spark.createDataFrame(
        [(c, v) for c, v in cells.items()], "cell bigint, v bigint"
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        spatial.flow_accumulation(df, "v", res_deg=RES, max_rounds=1)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(40404)
    cells = {}
    for _ in range(180):
        cells[_cell(rng.randrange(COLS), rng.randrange(ROWS))] = (
            rng.randrange(1, 60)
        )
    want = _python_flow(cells)
    assert _spark_flow(spark, cells) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE ras (cell BIGINT, v BIGINT)")
    con.executemany("INSERT INTO ras VALUES (?, ?)", list(cells.items()))
    rows = con.execute(
        spatial.flow_accumulation_sql("ras", "v", RES)
    ).fetchall()
    got = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert got == want

    d8rows = con.execute(
        spatial.flow_direction_sql("ras", "v", RES)
    ).fetchall()
    for cell, v, d8c, dv in d8rows:
        assert want[cell][1] == d8c
        if d8c is not None:
            assert dv == v - cells[d8c] > 0

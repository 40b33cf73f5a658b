"""Raster majority filter (spatial.tile_majority) — salt-and-pepper
cleanup plant, tie-to-smallest-class, wrap/clamp topology, support
non-dilation, random ≡ Python mirror ≡ DuckDB twin."""

import math
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("tilemaj-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 1.0
COLS = 360
ROWS = 180


def _run(spark, cells):
    df = spark.createDataFrame(cells, "cell long, cls string")
    out = spatial.tile_majority(df, "cls", res_deg=RES).collect()
    return {
        r.cell: (r.old_class, r.new_class, r.n_votes, r.n_nbrs)
        for r in out
    }


def _mirror(cells):
    occ = dict(cells)
    votes = {}
    for cell, cls in cells:
        y, x = cell // COLS, cell % COLS
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ty = y + dy
                if not (0 <= ty < ROWS):
                    continue
                t = ty * COLS + (x + dx + COLS) % COLS
                votes.setdefault(t, {})
                votes[t][cls] = votes[t].get(cls, 0) + 1
    out = {}
    for cell, cls in cells:
        v = votes[cell]
        new = min(v, key=lambda c: (-v[c], c))
        out[cell] = (cls, new, v[new], sum(v.values()))
    return out


def _cell(y, x):
    return y * COLS + x


def test_salt_and_pepper_flips(spark):
    # a lone 'b' surrounded by 8 'a' flips to 'a'
    cells = [(_cell(90 + dy, 50 + dx), "a")
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)
             if (dy, dx) != (0, 0)]
    cells.append((_cell(90, 50), "b"))
    got = _run(spark, cells)
    assert got[_cell(90, 50)] == ("b", "a", 8, 9)
    # the neighbors keep 'a'
    assert got[_cell(89, 49)][1] == "a"


def test_tie_breaks_to_smallest_class(spark):
    # isolated pair: each sees {a:1, b:1} → 'a'
    cells = [(_cell(10, 10), "b"), (_cell(10, 11), "a")]
    got = _run(spark, cells)
    assert got[_cell(10, 10)][1] == "a"
    assert got[_cell(10, 11)][1] == "a"


def test_longitude_wrap(spark):
    # col 0 and col 359 are neighbors (same row and diagonal)
    cells = [(_cell(40, 0), "a"), (_cell(40, 359), "b"),
             (_cell(41, 359), "b")]
    got = _run(spark, cells)
    assert got[_cell(40, 0)] == ("a", "b", 2, 3)


def test_support_does_not_dilate(spark):
    cells = [(_cell(20, 20), "a")]
    got = _run(spark, cells)
    assert set(got) == {_cell(20, 20)}
    assert got[_cell(20, 20)] == ("a", "a", 1, 1)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(5150)
    cells = {}
    for _ in range(250):
        y, x = rng.randrange(0, 6), rng.randrange(0, 8)
        # include the wrap seam and the top clamp row
        cell = _cell((0, 1, 2, 89, 179)[y % 5], (0, 1, 358, 359,
                     50, 51, 52, 53)[x])
        cells[cell] = rng.choice("abc")
    cells = sorted(cells.items())
    got = _run(spark, cells)
    assert got == _mirror(cells)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(cell BIGINT, cls VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cells)
    rows = con.execute(
        spatial.tile_majority_sql("t", "cls", res_deg=RES)
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got

"""Watershed basin labeling (spatial.basin_label) — planted two-pit
terrain, sink self-labels, deep descending chains (the log-depth
doubling vs the oracle's one-hop walk), partition consistency with
flow_direction's tie-break, and DuckDB twin parity on random
rasters."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("basin-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 1.0
COLS = 360


def _cell(lon_b, lat_b):
    return lat_b * COLS + lon_b


def _py(rows):
    """Mirror: D8 steepest-descent pointers (smallest-id ties), walk
    to sink."""
    vals = dict(rows)
    ptr = {}
    for c, v in rows:
        lat_b, lon_b = divmod(c, COLS)
        best = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                nl = lat_b + dy
                if not 0 <= nl < 180:
                    continue
                nc = nl * COLS + (lon_b + dx + COLS) % COLS
                if nc in vals and vals[nc] < v:
                    drop = v - vals[nc]
                    if best is None or (-drop, nc) < best:
                        best = (-drop, nc)
        ptr[c] = best[1] if best else None
    out = {}
    for c in vals:
        cur = c
        while ptr[cur] is not None:
            cur = ptr[cur]
        out[c] = cur
    sizes = {}
    for b in out.values():
        sizes[b] = sizes.get(b, 0) + 1
    return {
        c: (vals[c], out[c], sizes[out[c]], ptr[c] is None)
        for c in vals
    }


def _spark(spark, rows):
    df = spark.createDataFrame(rows, "cell bigint, v bigint")
    got = spatial.basin_label(df, "v", res_deg=RES).collect()
    return {
        r["cell"]: (r["v"], r["basin"], r["basin_size"], r["is_sink"])
        for r in got
    }


def test_two_pits_split_the_ridge(spark):
    # a 1-D valley: 0 1 2 3 2 1 0 → two pits at the ends; ridge cell
    # (v=3) ties 2-vs-2 and takes the smaller neighbor id
    base = _cell(100, 50)
    rows = [(base + i, v) for i, v in enumerate([0, 1, 2, 3, 2, 1, 0])]
    got = _spark(spark, rows)
    want = _py(rows)
    assert got == want
    assert got[base][3] is True and got[base + 6][3] is True
    assert got[base + 1][1] == base and got[base + 5][1] == base + 6
    # ridge drains to the smaller-id side (diagonal ties included)
    assert got[base + 3][1] == base


def test_single_sink_takes_all(spark):
    rows = [(_cell(10 + i, 20 + j), 10 + i + j)
            for i in range(4) for j in range(3)]
    got = _spark(spark, rows)
    want = _py(rows)
    assert got == want
    basins = {b for _, b, _, _ in got.values()}
    assert len(basins) == 1
    assert all(s == 12 for _, _, s, _ in got.values())


def test_deep_chain_log_rounds(spark):
    # a 40-cell strictly descending staircase: path length 39 forces
    # multiple doubling rounds; single basin at the low end
    base = _cell(200, 80)
    rows = [(base + i, 100 - i) for i in range(40)]
    got = _spark(spark, rows)
    assert all(v[1] == base + 39 for v in got.values())
    assert got[base + 39][2] == 40


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(66)
    cells = set()
    while len(cells) < 80:
        cells.add(_cell(rng.randrange(40, 60), rng.randrange(40, 60)))
    rows = [(c, rng.randrange(0, 50)) for c in sorted(cells)]
    want = _py(rows)
    assert _spark(spark, rows) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE r (cell BIGINT, v BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?)", rows)
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            spatial.basin_label_sql("r", "v", RES)
        ).fetchall()
    }
    assert got == want

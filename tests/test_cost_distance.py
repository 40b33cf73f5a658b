"""Raster cost-distance (spatial.raster_cost_distance) — detour
around expensive terrain (the behavior unit BFS can't express),
seed-cost-zero convention, unreachable NULL, negative-cost loud
failure, random ≡ Dijkstra mirror ≡ DuckDB twin."""

import heapq
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("costdist-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 1.0
COLS = 360


def _cell(y, x):
    return y * COLS + x


def _run(spark, cells, seeds, rounds=8):
    cdf = spark.createDataFrame(cells, "cell long, cost long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "cell long")
    out = spatial.raster_cost_distance(
        cdf, sdf, rounds=rounds, res_deg=RES
    ).collect()
    return {r.cell: r.dist for r in out}


def _mirror(cells, seeds, rounds=8):
    """Edge-bounded min-plus: Bellman-Ford over queen adjacency."""
    cost = dict(cells)
    occ = set(cost)

    def nbrs(c):
        y, x = c // COLS, c % COLS
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                ty = y + dy
                if 0 <= ty < 180:
                    t = ty * COLS + (x + dx + COLS) % COLS
                    if t in occ:
                        yield t

    dist = {c: (0 if c in seeds else None) for c in occ}
    for _ in range(rounds):
        new = dict(dist)
        for c in occ:
            if dist[c] is None:
                continue
            for t in nbrs(c):
                cand = dist[c] + cost[t]
                if new[t] is None or cand < new[t]:
                    new[t] = cand
        dist = new
    return dist


def test_detour_around_expensive_cell(spark):
    # straight line crosses a cost-100 wall; the detour row costs 3
    cells = [(_cell(50, 10), 1), (_cell(50, 11), 100),
             (_cell(50, 12), 1),
             (_cell(51, 11), 1)]
    got = _run(spark, cells, [_cell(50, 10)])
    assert got[_cell(50, 10)] == 0          # seed costs nothing
    assert got[_cell(50, 12)] == 2          # via (51,11): 1 + 1
    assert got[_cell(50, 11)] == 100


def test_unreachable_null_and_rounds_bound(spark):
    cells = [(_cell(10, 10), 1), (_cell(10, 50), 1)]
    got = _run(spark, cells, [_cell(10, 10)], rounds=4)
    assert got[_cell(10, 50)] is None


def test_negative_cost_fails_loud(spark):
    cells = [(_cell(5, 5), -1), (_cell(5, 6), 1)]
    with pytest.raises(Exception, match="negative"):
        _run(spark, cells, [_cell(5, 5)])


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(771)
    occ = {}
    for _ in range(120):
        occ[_cell(rng.randrange(60, 66), rng.randrange(20, 32))] = \
            rng.randrange(0, 20)
    cells = sorted(occ.items())
    seeds = [c for c, _ in cells[::17]] or [cells[0][0]]
    got = _run(spark, cells, seeds, rounds=6)
    assert got == _mirror(cells, set(seeds), rounds=6)
    con = duckdb.connect()
    con.execute("CREATE TABLE c(cell BIGINT, cost BIGINT)")
    con.executemany("INSERT INTO c VALUES (?, ?)", cells)
    con.execute("CREATE TABLE s(cell BIGINT)")
    con.executemany("INSERT INTO s VALUES (?)",
                    [(s,) for s in seeds])
    rows = con.execute(spatial.raster_cost_distance_sql(
        "c", "s", rounds=6, res_deg=RES
    )).fetchall()
    assert {r[0]: r[1] for r in rows} == got

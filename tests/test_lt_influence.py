"""Linear-threshold influence cascade (graph.lt_influence) —
hand-pinned rounds, exact threshold boundary, fixpoint stop,
loud round exhaustion, random ≡ set-simulation mirror ≡ DuckDB
full-recompute twin (the operator is frontier-incremental, so the
twin verifies the maintenance)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("lt-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    out = graph.lt_influence(e, s, **kw).collect()
    return {r.node: r.round for r in out}


def _mirror(edges, seeds, theta_ppm=500_000, max_rounds=8):
    e = {(s, d) for s, d in edges if s != d}
    indeg = {}
    for _, d in e:
        indeg[d] = indeg.get(d, 0) + 1
    w = {(s, d): 10**6 // indeg[d] for s, d in e}
    active = {x: 0 for x in set(seeds)}
    for r in range(1, max_rounds + 1):
        newly = set()
        for d in indeg:
            if d in active:
                continue
            tot = sum(w[(s, d)] for s, dd in e if dd == d
                      if (s, d) in w and s in active)
            if tot >= theta_ppm:
                newly.add(d)
        if not newly:
            break
        for x in newly:
            active[x] = r
    return active


EDGES = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]


def test_hand_pinned_cascade(spark):
    got = _run(spark, EDGES, [1])
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}
    assert got == _mirror(EDGES, [1])


def test_threshold_boundary(spark):
    # node 3 has in-degree 2 → per-edge weight exactly 500000; at
    # θ = 500001 one active in-neighbor is no longer enough
    got = _run(spark, EDGES, [1], theta_ppm=500_001)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    assert got == _mirror(EDGES, [1], theta_ppm=500_001)


def test_fixpoint_and_nonactivation(spark):
    # 9→8 never fires (8 unreachable from the seed side)
    edges = EDGES + [(9, 8)]
    got = _run(spark, edges, [1])
    assert 8 not in got and 9 not in got
    assert got == _mirror(edges, [1])


def test_round_exhaustion_raises(spark):
    chain = [(i, i + 1) for i in range(1, 6)]
    e = spark.createDataFrame(chain, "src long, dst long")
    s = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(RuntimeError, match="max_rounds"):
        graph.lt_influence(e, s, max_rounds=2)
    assert _run(spark, chain, [1], max_rounds=5) == \
        {i: i - 1 for i in range(1, 7)}


def test_validation(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    s = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError, match="theta"):
        graph.lt_influence(e, s, theta_ppm=0)
    with pytest.raises(ValueError, match="max_rounds"):
        graph.lt_influence(e, s, max_rounds=0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(555)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(140)})
    seeds = [0, 1, 2]
    got = _run(spark, edges, seeds, theta_ppm=400_000, max_rounds=10)
    assert got == _mirror(edges, seeds, theta_ppm=400_000,
                          max_rounds=10)
    assert set(got.values()) != {0}   # the cascade actually spreads

    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    con.execute("CREATE TABLE s(node BIGINT)")
    con.executemany("INSERT INTO s VALUES (?)", [(x,) for x in seeds])
    out = con.execute(graph.lt_influence_sql(
        "e", "s", theta_ppm=400_000, max_rounds=10
    )).fetchall()
    assert {r[0]: r[1] for r in out} == got

"""Widest-path / bottleneck distance (graph.widest_path) — the
(max, min) semiring: hand-pinned bottlenecks, re-entry on
later-but-wider paths, ≤ k-edge honesty, seed exclusion, capacity
validation, random ≡ Dijkstra-style mirror ≡ DuckDB unrolled twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("widest-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, n_nodes, edges, seeds, rounds):
    nodes = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "node long"
    )
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    out = graph.widest_path(nodes, s, e, rounds).collect()
    return {r.node: r.width for r in out}


def _mirror(n_nodes, edges, seeds, rounds):
    """Bounded-hop max-min via round-by-round full relaxation."""
    INF = 1 << 62
    width = {i: (INF if i in set(seeds) else None)
             for i in range(n_nodes)}
    for _ in range(rounds):
        nxt = dict(width)
        for s, d, w in edges:
            if width[s] is not None:
                cand = min(width[s], w)
                if nxt[d] is None or cand > nxt[d]:
                    nxt[d] = max(nxt[d] or 0, cand) \
                        if nxt[d] is not None else cand
        width = nxt
    return {i: width[i] for i in range(n_nodes) if i not in set(seeds)}


def test_hand_pinned_bottleneck(spark):
    # 0→1 (cap 5) →2 (cap 3); direct 0→2 (cap 2): best bottleneck
    # to 2 is min(5,3)=3 via the two-hop path
    edges = [(0, 1, 5), (1, 2, 3), (0, 2, 2)]
    got = _run(spark, 3, edges, [0], rounds=4)
    assert got == {1: 5, 2: 3}
    assert got == _mirror(3, edges, [0], 4)


def test_hop_bound_honesty(spark):
    # with rounds=1 only the direct (narrow) path is visible
    edges = [(0, 1, 5), (1, 2, 3), (0, 2, 2)]
    got = _run(spark, 3, edges, [0], rounds=1)
    assert got == {1: 5, 2: 2}
    assert got == _mirror(3, edges, [0], 1)


def test_reentry_on_wider_path(spark):
    # 3 settles at width 1 in round 1, then re-improves to 4 via the
    # longer 0→1→2→3 path — the frontier must re-admit it
    edges = [(0, 3, 1), (0, 1, 9), (1, 2, 6), (2, 3, 4)]
    got = _run(spark, 4, edges, [0], rounds=5)
    assert got[3] == 4
    assert got == _mirror(4, edges, [0], 5)


def test_unreached_null_and_seed_excluded(spark):
    edges = [(0, 1, 2)]
    got = _run(spark, 4, edges, [0], rounds=3)
    assert got == {1: 2, 2: None, 3: None}


def test_capacity_validation(spark):
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    s = spark.createDataFrame([(0,)], "node long")
    e = spark.createDataFrame([(0, 1, -1)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="capacities"):
        graph.widest_path(nodes, s, e, 2)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(424)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n))
                  for _ in range(120)})
    edges = [(s, d, rng.randrange(1, 20)) for s, d in edges
             if s != d]
    seeds = [0, 7]
    got = _run(spark, n, edges, seeds, rounds=6)
    assert got == _mirror(n, edges, seeds, 6)
    assert any(v is not None for v in got.values())

    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n)])
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT, w BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", edges)
    con.execute("CREATE TABLE sd(node BIGINT)")
    con.executemany("INSERT INTO sd VALUES (?)",
                    [(x,) for x in seeds])
    out = con.execute(
        graph.widest_path_sql("nd", "sd", "e", rounds=6)
    ).fetchall()
    assert {r[0]: r[1] for r in out} == got

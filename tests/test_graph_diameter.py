"""Double-sweep diameter bound (graph.graph_diameter) — paths (exact
on trees), cycles, star, disconnected components, radius honesty,
random tree ≡ BFS mirror ≡ twin."""

import random
from collections import deque

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("diam-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, node_ids, edge_pairs, rounds=8):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    edges = spark.createDataFrame(edge_pairs, "src long, dst long")
    r = graph.graph_diameter(nodes, edges, rounds).collect()[0]
    return (r.start_node, r.far_node, r.end_node, r.sweep1_ecc,
            r.diameter_lb, r.n_reached)


def _bfs(adj, s, nodes):
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _mirror(node_ids, edge_pairs, rounds=8):
    adj = {}
    for a, b in edge_pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    start = min(node_ids)
    d1 = {n: d for n, d in _bfs(adj, start, node_ids).items()
          if d <= rounds}
    u = max(d1, key=lambda n: (d1[n], -n))
    ecc1 = d1[u]
    d2 = {n: d for n, d in _bfs(adj, u, node_ids).items()
          if d <= rounds}
    v = max(d2, key=lambda n: (d2[n], -n))
    return (start, u, v, ecc1, d2[v], len(d2))


def test_path_exact(spark):
    # path 0-1-2-3-4: diameter 4, double sweep is exact on trees
    edges = [(i, i + 1) for i in range(4)]
    got = _run(spark, list(range(5)), edges)
    assert got == (0, 4, 0, 4, 4, 5)


def test_star(spark):
    edges = [(0, i) for i in range(1, 6)]
    got = _run(spark, list(range(6)), edges)
    # ecc(0)=1 → far=1 (smallest id tie-break), then ecc(1)=2
    assert got == (0, 1, 2, 1, 2, 6)


def test_cycle_even(spark):
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _run(spark, list(range(n)), edges)
    assert got[3] == 4 and got[4] == 4   # both sweeps see n/2


def test_component_restriction(spark):
    # second component is invisible to the sweep from min-id's side
    edges = [(0, 1), (1, 2), (10, 11)]
    got = _run(spark, [0, 1, 2, 10, 11], edges)
    assert got[5] == 3   # n_reached: only the start's component
    assert got == (0, 2, 0, 2, 2, 3)


def test_rounds_honesty(spark):
    # a 6-path swept with rounds=2: figures are exact-within-radius
    edges = [(i, i + 1) for i in range(6)]
    got = _run(spark, list(range(7)), edges, rounds=2)
    assert got == _mirror(list(range(7)), edges, rounds=2)
    assert got[4] == 2   # exact-within-radius, never a wrong number


def test_random_tree_vs_mirror_and_twin(spark):
    rng = random.Random(606)
    node_ids = list(range(40))
    edges = [(rng.randrange(i), i) for i in range(1, 40)]
    got = _run(spark, node_ids, edges, rounds=12)
    assert got == _mirror(node_ids, edges, rounds=12)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(n,) for n in node_ids])
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    out = con.execute(
        graph.graph_diameter_sql("nd", "eg", rounds=12)
    ).fetchall()[0]
    assert tuple(out) == got

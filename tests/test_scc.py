"""Strongly connected components (graph.scc_components):
forward–backward frontier-only min-label peeling, exact membership,
loud convergence guards, brute-force mutual-reachability Python
mirror, recursive-closure DuckDB twin parity."""

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("scc-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, n_nodes, edges, **kw):
    nodes = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "node long"
    )
    eg = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        eg = eg.where("src < 0")
    out = graph.scc_components(nodes, eg, **kw).collect()
    return {r["node"]: (r["scc"], r["scc_size"]) for r in out}


def _python(n_nodes, edges):
    """Brute-force mutual reachability (warshall closure)."""
    reach = [[False] * n_nodes for _ in range(n_nodes)]
    for i in range(n_nodes):
        reach[i][i] = True
    for s, d in edges:
        reach[s][d] = True
    for k in range(n_nodes):
        for i in range(n_nodes):
            if reach[i][k]:
                for j in range(n_nodes):
                    if reach[k][j]:
                        reach[i][j] = True
    rep = {
        v: min(
            u
            for u in range(n_nodes)
            if reach[v][u] and reach[u][v]
        )
        for v in range(n_nodes)
    }
    size = {}
    for v, r in rep.items():
        size[r] = size.get(r, 0) + 1
    return {v: (r, size[r]) for v, r in rep.items()}


def test_two_cycles_one_way_bridge(spark):
    # 0->1->2->0 and 3->4->5->3, bridged 2->3 (one way only).
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    got = _run(spark, 6, edges)
    assert got == {0: (0, 3), 1: (0, 3), 2: (0, 3),
                   3: (3, 3), 4: (3, 3), 5: (3, 3)}


def test_acyclic_chain_all_singletons(spark):
    edges = [(i, i + 1) for i in range(5)]
    got = _run(spark, 6, edges)
    assert got == {i: (i, 1) for i in range(6)}


def test_self_loop_and_isolated(spark):
    got = _run(spark, 3, [(0, 0)])
    assert got == {0: (0, 1), 1: (1, 1), 2: (2, 1)}


def test_ring_is_one_scc(spark):
    # a directed ring with ids running AGAINST the propagation
    # gradient — the layout that degrades pointer jumping to
    # 1 hop/round (why the operator uses frontier relaxation with an
    # honest O(diameter) budget instead): one SCC, one peel.
    n = 20
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _run(spark, n, edges)
    assert got == {i: (0, n) for i in range(n)}


def test_peel_order_follows_condensation(spark):
    # SCC {2,3} feeds SCC {0,1}: round 1 finalizes {0,1} (global min)
    # but NOT {2,3} (its forward min is 0, backward min is 2), so a
    # max_peels=1 budget fails loud and 2 rounds succeed.
    edges = [(2, 3), (3, 2), (0, 1), (1, 0), (2, 0)]
    got = _run(spark, 4, edges, max_peels=2)
    assert got == {0: (0, 2), 1: (0, 2), 2: (2, 2), 3: (2, 2)}
    with pytest.raises(Exception, match="max_peels"):
        _run(spark, 4, edges, max_peels=1)


def test_hops_guard_fires(spark):
    n = 40
    edges = [(i, (i + 1) % n) for i in range(n)]
    with pytest.raises(Exception, match="max_hops"):
        _run(spark, n, edges, max_hops=2)


def test_empty_graph(spark):
    assert _run(spark, 0, []) == {}


def _random_graph():
    n = 48
    edges = []
    for i in range(n):
        for p, j in ((7, 1), (13, 5)):
            if (i * 3 + p) % 4 != 0:
                edges.append((i, (i * p + j) % n))
    return n, edges


def test_random_matches_mirror(spark):
    n, edges = _random_graph()
    assert _run(spark, n, edges) == _python(n, edges)


def test_duckdb_twin_parity(spark):
    n, edges = _random_graph()
    con = duckdb.connect()
    con.register("scc_n", pd.DataFrame({"node": list(range(n))}))
    con.register("scc_e", pd.DataFrame(edges, columns=["src", "dst"]))
    sql = graph.scc_sql("scc_n", "scc_e")
    oracle = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(sql).fetchall()
    }
    assert _run(spark, n, edges) == oracle

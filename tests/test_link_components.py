"""Connected components contract surface: graph.min_label_components
(pointer-doubling propagation) vs graph.components_sql (DuckDB
recursive transitive-closure walk) — planted multi-component shapes, a
long chain that needs the doubling shortcut, isolated vertices, and a
random-graph parity sweep against a Python union-find mirror."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("components-tests", master="local[4]",
                    shuffle_partitions=8)


def _spark_components(spark, n_nodes, edges, max_iters=16):
    ids = spark.createDataFrame([(i,) for i in range(n_nodes)],
                                "id bigint")
    eg = spark.createDataFrame(
        edges or [(0, 0)], "id_a bigint, id_b bigint"
    )
    if not edges:
        eg = eg.where("id_a <> id_a")  # empty
    out = graph.min_label_components(ids, eg, max_iters, "test")
    return {r["id"]: r["label"] for r in out.collect()}


def _duckdb_components(n_nodes, edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE nd (node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n_nodes)])
    con.execute("CREATE TABLE eg (src BIGINT, dst BIGINT)")
    if edges:
        con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    rows = con.execute(graph.components_sql("nd", "eg")).fetchall()
    return dict(rows)


def _python_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label per component
    comp_min = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n_nodes)}


def test_two_components_and_isolate(spark):
    edges = [(1, 2), (2, 3), (5, 6)]
    want = {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6 - 1}
    want[6] = 5
    got = _spark_components(spark, 7, edges)
    assert got == want
    assert _duckdb_components(7, edges) == want


def test_long_chain_converges_by_doubling(spark):
    """A 40-node chain needs ~log2(40) ≈ 6 doubling rounds — far
    below max_iters — while naive one-hop would need 40."""
    edges = [(i, i + 1) for i in range(39)]
    got = _spark_components(spark, 40, edges, max_iters=10)
    assert set(got.values()) == {0}
    assert _duckdb_components(40, edges) == got


def test_nonconvergence_warns(spark):
    edges = [(i, i + 1) for i in range(30)]
    with pytest.warns(RuntimeWarning, match="did NOT converge"):
        _spark_components(spark, 31, edges, max_iters=1)


def test_direction_irrelevant(spark):
    """(a,b) and (b,a) produce identical components."""
    f = _spark_components(spark, 5, [(3, 1), (1, 0)])
    r = _spark_components(spark, 5, [(1, 3), (0, 1)])
    assert f == r == {0: 0, 1: 0, 2: 2, 3: 0, 4: 4}


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(6071)
    n = 60
    edges = list({
        (rng.randrange(n), rng.randrange(n)) for _ in range(45)
    })
    want = _python_components(n, edges)
    assert _spark_components(spark, n, edges) == want
    assert _duckdb_components(n, edges) == want

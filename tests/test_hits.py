"""Quantized-integer HITS (graph.hits_quantized) — planted star /
bipartite graphs with closed-form scores, a plain-int Python mirror on
a random digraph, and DuckDB twin parity (graph.hits_sql)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph

S = graph.HITS_SCALE


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hits-tests", master="local[4]",
                    shuffle_partitions=8)


def _run_python(nodes, edges, iterations, scale=S):
    """The recurrence in plain ints — the independent ground truth."""
    n = len(nodes)
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iterations):
        a_raw = {v: 0 for v in nodes}
        for s, d in edges:
            a_raw[d] += h[s]
        tot = sum(a_raw.values())
        a = {
            v: (a_raw[v] * n * scale) // tot if tot else 0
            for v in nodes
        }
        h_raw = {v: 0 for v in nodes}
        for s, d in edges:
            h_raw[s] += a[d]
        tot = sum(h_raw.values())
        h = {
            v: (h_raw[v] * n * scale) // tot if tot else 0
            for v in nodes
        }
    return {v: (a[v], h[v]) for v in nodes}


def _spark_hits(spark, nodes, edges, **kw):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.node: (r.auth_q, r.hub_q)
        for r in graph.hits_quantized(ndf, edf, **kw).collect()
    }


def test_star_closed_form(spark):
    """4 spokes → 1 sink: the sink is the sole authority (all mass,
    5·scale), spokes split the hub mass equally (5·scale DIV 4 each);
    the sink's hub score and the spokes' authority scores are 0."""
    nodes = list(range(5))
    edges = [(i, 0) for i in range(1, 5)]
    got = _spark_hits(spark, nodes, edges, iterations=3)
    assert got[0] == (5 * S, 0)
    spoke_hub = (5 * S * 5 * S) // (4 * 5 * S)  # = 5·S DIV 4
    for i in range(1, 5):
        assert got[i] == (0, spoke_hub)


def test_complete_bipartite(spark):
    """K_{2,3}: 2 hubs each link all 3 authorities — within each side
    scores are equal, and the smaller side holds more per-node mass."""
    nodes = list(range(5))
    edges = [(h, a) for h in (0, 1) for a in (2, 3, 4)]
    got = _spark_hits(spark, nodes, edges, iterations=4)
    assert got[0] == got[1]
    assert got[2] == got[3] == got[4]
    assert got[0][0] == 0 and got[2][1] == 0      # pure roles
    assert got[0][1] > got[2][0]                   # 2 hubs > 3 auths
    want = _run_python(nodes, edges, iterations=4)
    assert got == want


def test_hub_vs_authority_separation(spark):
    """A directory page pointing at every content page outranks the
    content pages as a hub and scores zero as an authority."""
    nodes = list(range(8))
    edges = [(0, i) for i in range(1, 8)] + [(1, 2), (3, 2), (4, 2)]
    got = _spark_hits(spark, nodes, edges, iterations=6)
    assert got[0][1] == max(h for _, h in got.values())
    assert got[0][0] == 0
    # node 2 has the most in-links from hubby nodes → top authority
    assert got[2][0] == max(a for a, _ in got.values())


def test_random_graph_matches_python_and_duckdb(spark):
    rng = random.Random(7)
    nodes = list(range(50))
    edges = sorted({
        (rng.randrange(50), rng.randrange(50)) for _ in range(180)
    })
    edges = [(s, d) for s, d in edges if s != d]
    want = _run_python(nodes, edges, iterations=5)
    got = _spark_hits(spark, nodes, edges, iterations=5)
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE nodes_t(node BIGINT)")
    con.executemany("INSERT INTO nodes_t VALUES (?)",
                    [(v,) for v in nodes])
    con.execute("CREATE TABLE edges_t(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges_t VALUES (?, ?)", edges)
    want_sql = {
        node: (a, h)
        for node, a, h in con.execute(
            graph.hits_sql("nodes_t", "edges_t", iterations=5)
        ).fetchall()
    }
    assert got == want_sql


def test_mass_is_conserved_up_to_floor_loss(spark):
    """Each normalization floors once per node — each vector's total
    stays within n of n·scale and never exceeds it."""
    rng = random.Random(11)
    nodes = list(range(30))
    edges = [(s, (s * 7 + 1) % 30) for s in range(30)] + [
        (s, (s * 11 + 4) % 30) for s in range(0, 30, 2)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    got = _spark_hits(spark, nodes, edges, iterations=4)
    n = len(nodes)
    for idx in (0, 1):
        total = sum(v[idx] for v in got.values())
        assert total <= n * S
        assert total >= n * S - n


def test_no_edges_all_zero(spark):
    nodes = [0, 1, 2]
    got = _spark_hits(spark, nodes, [], iterations=2)
    assert got == {v: (0, 0) for v in nodes}


def test_empty_graph(spark):
    ndf = spark.createDataFrame([], "node bigint")
    edf = spark.createDataFrame([], "src bigint, dst bigint")
    assert graph.hits_quantized(ndf, edf, iterations=2).count() == 0


def test_iterations_validated(spark):
    ndf = spark.createDataFrame([(1,)], "node bigint")
    edf = spark.createDataFrame([], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        graph.hits_quantized(ndf, edf, iterations=0)
    with pytest.raises(ValueError):
        graph.hits_sql("n", "e", iterations=0)

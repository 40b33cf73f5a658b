"""Quantized-integer PageRank (graph.pagerank_quantized)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("pagerank-tests", master="local[4]",
                    shuffle_partitions=8)


def _run_python(nodes, edges, iterations, damping=85, scale=graph.PR_SCALE):
    """The recurrence in plain ints — the independent ground truth."""
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (100 - damping) * scale // 100
    r = {v: scale for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if v not in outdeg)
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            if d in contrib:
                contrib[d] += r[s] // outdeg[s]
        r = {
            v: base + (damping * (contrib[v] + dang // n)) // 100
            for v in nodes
        }
    return r


def _spark_pr(spark, nodes, edges, **kw):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.node: r.rank_q
        for r in graph.pagerank_quantized(ndf, edf, **kw).collect()
    }


def test_cycle_is_uniform(spark):
    """A directed cycle is perfectly symmetric — every node must hold
    exactly the initial mass after any number of rounds."""
    nodes = list(range(6))
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _spark_pr(spark, nodes, edges, iterations=4)
    assert set(got.values()) == {graph.PR_SCALE}


def test_star_with_dangling_sink(spark):
    """Hub-and-spoke: all spokes point at the sink, the sink dangles.
    Matches the plain-int recurrence exactly, and the sink outranks
    the spokes."""
    nodes = list(range(5))
    edges = [(i, 0) for i in range(1, 5)]
    want = _run_python(nodes, edges, iterations=8)
    got = _spark_pr(spark, nodes, edges, iterations=8)
    assert got == want
    assert got[0] > got[1]


def test_random_graph_matches_python_and_duckdb(spark):
    rng = random.Random(3)
    nodes = list(range(60))
    edges = sorted({
        (rng.randrange(60), rng.randrange(60)) for _ in range(200)
    })
    edges = [(s, d) for s, d in edges if s != d]
    want = _run_python(nodes, edges, iterations=5)
    got = _spark_pr(spark, nodes, edges, iterations=5)
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE nodes_t(node BIGINT)")
    con.executemany("INSERT INTO nodes_t VALUES (?)", [(v,) for v in nodes])
    con.execute("CREATE TABLE edges_t(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges_t VALUES (?, ?)", edges)
    want_sql = dict(con.execute(
        graph.pagerank_sql("nodes_t", "edges_t", iterations=5)).fetchall())
    assert got == want_sql


def test_mass_is_conserved_up_to_floor_loss(spark):
    """Each round loses < 1/scale per node per division (two nested
    DIVs) — total mass stays within n·2·iters of n·scale and never
    exceeds it."""
    rng = random.Random(8)
    nodes = list(range(40))
    edges = [(s, d) for s in range(40) if s % 3
             for d in {(s * 11 + 1) % 40, (s * 7 + 3) % 40} if d != s]
    got = _spark_pr(spark, nodes, edges, iterations=6)
    total = sum(got.values())
    n, iters = len(nodes), 6
    assert total <= n * graph.PR_SCALE
    # generous loss bound: every node floors twice per round, plus the
    # dangling redistribution floor, each < 1 quantum before scaling
    assert total >= n * graph.PR_SCALE - n * iters * 200


def test_empty_graph(spark):
    ndf = spark.createDataFrame([], "node bigint")
    edf = spark.createDataFrame([], "src bigint, dst bigint")
    assert graph.pagerank_quantized(ndf, edf, iterations=2).count() == 0


def test_damping_validated(spark):
    ndf = spark.createDataFrame([(1,)], "node bigint")
    edf = spark.createDataFrame([], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        graph.pagerank_quantized(ndf, edf, damping_pct=101)


def test_session_confs_restored_after_call(spark):
    """r06 internals: the iteration loop scopes AQE off and pins
    shuffle.partitions; both must be restored after the call — and
    after a FAILING call (the damping guard fires before the scope,
    the empty-graph path returns through the finally)."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    ndf = spark.createDataFrame([(1,), (2,)], "node bigint")
    edf = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    graph.pagerank_quantized(ndf, edf, iterations=1)
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_sp
    # empty graph exits through the early-return path inside the scope
    e_n = spark.createDataFrame([], "node bigint")
    e_e = spark.createDataFrame([], "src bigint, dst bigint")
    graph.pagerank_quantized(e_n, e_e, iterations=1).count()
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_sp

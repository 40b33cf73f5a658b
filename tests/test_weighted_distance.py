"""Bellman–Ford weighted distance (graph.weighted_distance) — Spark
vs a plain-Python min-plus ground truth of the same bounded-round
recurrence, plus the DuckDB SQL twin on random weighted digraphs
(the weighted companion of link_distance; reference parity: the
bounded closure walk of cascade.rb with edge cost generalizing hop
count — see COVERAGE.md)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("weighted-distance-tests", master="local[4]",
                    shuffle_partitions=8)


def _bf_python(nodes, seeds, edges, rounds):
    """edges: [(src, dst, w)] — min-weight over paths of ≤ rounds edges."""
    dist = {v: (0 if v in seeds else None) for v in nodes}
    for _ in range(rounds):
        nd = {}
        for s, d, w in edges:
            if dist.get(s) is not None and d in dist:
                c = dist[s] + w
                if d not in nd or c < nd[d]:
                    nd[d] = c
        for v, c in nd.items():
            if dist[v] is None or c < dist[v]:
                dist[v] = c
    return dist


def _spark_bf(spark, nodes, seeds, edges, rounds):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    sdf = spark.createDataFrame([(v,) for v in seeds], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    out = graph.weighted_distance(ndf, sdf, edf, rounds=rounds)
    return {r["node"]: r["dist"] for r in out.collect()}


def test_hand_chain_vs_shortcut(spark):
    """A 3-hop cheap chain beats a 1-hop expensive shortcut — but only
    once rounds admit the longer path (the ≤ k-edge optimality
    reading, round by round)."""
    nodes = [0, 1, 2, 3]
    edges = [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    assert _spark_bf(spark, nodes, [0], edges, rounds=1)[3] == 10
    assert _spark_bf(spark, nodes, [0], edges, rounds=3)[3] == 3


def test_frontier_reentry(spark):
    """A node settled early re-enters the frontier when a longer-but-
    cheaper path arrives, and keeps propagating the improvement
    downstream (the weighted-specific frontier behavior)."""
    # 0→4 direct (w=10); 0→1→2→3→4 cost 4; 4→5 extends the improvement
    nodes = [0, 1, 2, 3, 4, 5]
    edges = [
        (0, 4, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1),
    ]
    got = _spark_bf(spark, nodes, [0], edges, rounds=6)
    assert got[4] == 4 and got[5] == 5


def test_unreached_null_and_short_circuit(spark):
    """Disconnected nodes stay NULL; rounds beyond the fixpoint change
    nothing (the frontier drains and the loop exits early)."""
    nodes = [0, 1, 2, 9]
    edges = [(0, 1, 2), (1, 2, 3)]
    exact = _spark_bf(spark, nodes, [0], edges, rounds=2)
    overshoot = _spark_bf(spark, nodes, [0], edges, rounds=40)
    assert exact == overshoot == {0: 0, 1: 2, 2: 5, 9: None}


def test_negative_weight_raises(spark):
    nodes = [0, 1]
    with pytest.raises(ValueError, match="non-negative"):
        _spark_bf(spark, nodes, [0], [(0, 1, -1)], rounds=1)


def test_unit_weights_match_bfs(spark):
    """With w=1 everywhere the operator degenerates to link_distance."""
    rng = random.Random(77)
    nodes = list(range(30))
    raw = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(90)})
    pairs = [e for e in raw if e[0] != e[1]]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    sdf = spark.createDataFrame([(2,), (11,)], "node bigint")
    edf = spark.createDataFrame(pairs, "src bigint, dst bigint")
    bfs = {
        r["node"]: r["dist"]
        for r in graph.link_distance(ndf, sdf, edf, rounds=5).collect()
    }
    got = _spark_bf(
        spark, nodes, [2, 11], [(s, d, 1) for s, d in pairs], rounds=5
    )
    assert got == bfs


def test_random_vs_python_and_duckdb(spark):
    """Random weighted digraph: Spark == plain-int recurrence == twin."""
    rng = random.Random(4242)
    nodes = list(range(40))
    raw = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(130)})
    edges = [
        (s, d, rng.randrange(1, 9)) for s, d in raw if s != d
    ]
    seeds = [5, 23]
    want = _bf_python(nodes, set(seeds), edges, rounds=4)
    got = _spark_bf(spark, nodes, seeds, edges, rounds=4)
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE nd (node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)", [(v,) for v in nodes])
    con.execute("CREATE TABLE sd (node BIGINT)")
    con.executemany("INSERT INTO sd VALUES (?)", [(v,) for v in seeds])
    con.execute("CREATE TABLE eg (src BIGINT, dst BIGINT, w BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?, ?)", edges)
    sql = graph.weighted_distance_sql("nd", "sd", "eg", rounds=4)
    twin = dict(con.execute(sql).fetchall())
    assert twin == want

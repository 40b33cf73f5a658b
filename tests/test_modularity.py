"""Newman modularity of a given partition (graph.modularity): exact
A²-cleared integer form, sign-decomposed division, loud unlabeled-
endpoint guard, Python mirror, DuckDB twin."""

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("modularity-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, labels, edges):
    ldf = spark.createDataFrame(labels, "node bigint, label string")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.label: (r.n_nodes, r.deg_sum, r.e_in, r.q_ppm)
        for r in graph.modularity(ldf, edf).collect()
    }


def _mirror(labels, edges):
    lab = dict(labels)
    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    a = len(sym)
    out = {}
    for c in sorted({l for _, l in labels}):
        nn = sum(1 for _, l in labels if l == c)
        deg = sum(1 for s, _ in sym if lab[s] == c)
        a_in = sum(
            1 for s, d in sym if lab[s] == c and lab[d] == c
        )
        if a == 0:
            q = None
        else:
            num = a * a_in - deg * deg
            q = (
                -((-num * 10**6) // (a * a))
                if num < 0
                else (num * 10**6) // (a * a)
            )
        out[c] = (nn, deg, a_in // 2, q)
    return out


def test_two_cliques_bridge(spark):
    # two triangles joined by one bridge edge, labeled by clique:
    # m=7, strong community structure -> positive q for both.
    labels = [(i, "a") for i in range(3)] + [(i, "b") for i in range(3, 6)]
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    got = _run(spark, labels, edges)
    assert got == _mirror(labels, edges)
    # closed form: A=14, each community a_in=6, deg=7:
    # q_num = 14*6 - 49 = 35; q_ppm = 35e6 // 196 = 178571.
    assert got["a"] == (3, 7, 3, 178571)
    assert got["b"] == (3, 7, 3, 178571)


def test_anti_community_negative(spark):
    # complete bipartite K2,2 split ALONG the bipartition: zero
    # intra edges, q_num = -deg^2 < 0 -> negative q, trunc toward 0.
    labels = [(0, "l"), (1, "l"), (2, "r"), (3, "r")]
    edges = [(0, 2), (0, 3), (1, 2), (1, 3)]
    got = _run(spark, labels, edges)
    assert got == _mirror(labels, edges)
    assert got["l"][3] < 0 and got["l"] == got["r"]
    # A=8, deg=4, a_in=0: q_num=-16 -> -(16e6 // 64) = -250000.
    assert got["l"][3] == -250000


def test_whole_graph_one_community(spark):
    # single community: Q = 1 - 1 = 0 exactly (a_in = A, deg = A).
    labels = [(i, "x") for i in range(4)]
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, labels, edges)
    assert got["x"] == (4, 6, 3, 0)


def test_edgeless_graph_null(spark):
    got = _run(spark, [(0, "a"), (1, "b")], [])
    assert got["a"] == (1, 0, 0, None)
    assert got["b"] == (1, 0, 0, None)


def test_isolated_nodes_counted(spark):
    # community 'b' has a member with no edges: n_nodes counts it,
    # degree does not.
    labels = [(0, "a"), (1, "a"), (2, "b"), (3, "b")]
    edges = [(0, 1), (1, 2)]
    got = _run(spark, labels, edges)
    assert got == _mirror(labels, edges)
    assert got["b"][0] == 2 and got["b"][1] == 1


def test_unlabeled_endpoint_raises(spark):
    labels = [(0, "a")]
    edges = [(0, 1)]
    with pytest.raises(Exception, match="unlabeled"):
        _run(spark, labels, edges)


def test_directed_and_self_loop_normalization(spark):
    # both orientations + a self-loop collapse to one undirected edge.
    labels = [(0, "a"), (1, "a")]
    got = _run(spark, labels, [(0, 1), (1, 0), (0, 0)])
    assert got["a"] == (2, 2, 1, 0)


def test_modularity_mirror_randomized(spark):
    labels = [(i, f"c{(i * 5 + 1) % 4}") for i in range(40)]
    edges = [
        (i, (i * i * 7 + 3) % 40)
        for i in range(160)
    ]
    edges = [(s % 40, d) for s, d in edges]
    got = _run(spark, labels, edges)
    assert got == _mirror(labels, edges)


def test_modularity_duckdb_twin(spark):
    labels = [(i, f"c{(i * 3 + 2) % 5}") for i in range(30)]
    edges = [(i % 30, (i * 11 + 5) % 30) for i in range(90)]
    got = _run(spark, labels, edges)
    con = duckdb.connect()
    con.register(
        "lab", pd.DataFrame(labels, columns=["node", "label"])
    )
    con.register("eg", pd.DataFrame(edges, columns=["src", "dst"]))
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            graph.modularity_sql("lab", "eg")
        ).fetchall()
    }
    assert got == want

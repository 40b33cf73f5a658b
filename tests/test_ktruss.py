"""k-truss (graph.ktruss) — planted clique-plus-spokes peeling,
cascade rounds, networkx-free Python peeling mirror, twin parity,
convergence guard."""

import itertools
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ktruss-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, edges, k, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = graph.ktruss(df, k, **kw).collect()
    return {(r.src, r.dst): r.support for r in out}


def _python_mirror(edges, k):
    """Direct order-independent peel with brute-force support."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for u, v in es:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(adj[u] & adj[v]) for u, v in es
        }
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return sup
        es -= drop
        if not es:
            return {}


def test_clique_survives_spokes_fall(spark):
    """K5 plus pendant spokes: every clique edge has support 3; the
    spokes have 0 and peel away (k=4 keeps edges with ≥2 triangles)."""
    clique = list(itertools.combinations(range(5), 2))
    spokes = [(i, 100 + i) for i in range(5)]
    got = _run(spark, clique + spokes, k=4)
    assert set(got) == {tuple(e) for e in clique}
    assert all(s == 3 for s in got.values())


def test_cascade_peel(spark):
    """A triangle chain: dropping the weakest edge cascades — the
    final truss must match the fixpoint peel, not one round."""
    edges = [(0, 1), (1, 2), (0, 2),
             (2, 3), (3, 4), (2, 4),
             (4, 5), (5, 6), (4, 6)]
    got = _run(spark, edges, k=4)
    assert got == {}  # each triangle has per-edge support 1 < 2
    got3 = _run(spark, edges, k=3)
    assert set(got3) == {tuple(sorted(e)) for e in edges}


def test_k4_needs_two_triangles_per_edge(spark):
    """Two triangles sharing an edge: the shared edge has support 2
    but its wing edges have 1 → everything peels at k=4; at k=3 all
    survive."""
    edges = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    assert _run(spark, edges, k=4) == {}
    got = _run(spark, edges, k=3)
    assert set(got) == {(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)}
    assert got[(0, 1)] == 2


def test_dedup_and_selfloop(spark):
    edges = [(0, 1), (1, 0), (0, 0), (1, 2), (0, 2), (2, 1)]
    got = _run(spark, edges, k=3)
    assert set(got) == {(0, 1), (0, 2), (1, 2)}


def test_nonconvergence_raises(spark):
    """A long cascade chain with max_rounds=1 must raise, not return
    a partial truss."""
    edges = []
    for i in range(6):
        edges += [(i, i + 1), (i + 1, i + 2), (i, i + 2)]
    # k=4 peels everything, needs ≥2 rounds on this chain? Force with
    # max_rounds=0-equivalent: use 1 round and a graph needing 2.
    with pytest.raises(Exception, match="converge"):
        _run(spark, edges + [(100, 101), (101, 102), (100, 102),
                             (100, 103), (101, 103)], k=4,
             max_rounds=1)


def test_params(spark):
    with pytest.raises(ValueError, match="k must be"):
        graph.ktruss_sql("t", k=2)


def test_random_matches_mirror_and_duckdb(spark):
    rng = random.Random(61)
    nodes = list(range(18))
    edges = sorted({
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)
    })
    for k in (3, 4, 5):
        got = _run(spark, edges, k=k, max_rounds=12)
        assert got == _python_mirror(edges, k), f"k={k}"
        con = duckdb.connect()
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        rows = con.execute(
            graph.ktruss_sql("e", k=k, max_rounds=12)
        ).fetchall()
        assert {(r[0], r[1]): r[2] for r in rows} == got, f"k={k}"
        con.close()

"""Onion decomposition (graph.onion_layers) — path peels outside-in,
clique is one deep shell, layers refine a shared coreness, isolated
nodes peel first, loud depth bound, random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("onion-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, n, edges, max_layers=32):
    nd = spark.createDataFrame([(i,) for i in range(n)], "node long")
    eg = spark.createDataFrame(edges, "src long, dst long")
    out = graph.onion_layers(nd, eg, max_layers=max_layers).collect()
    return {r.node: (r.coreness, r.layer) for r in out}


def _mirror(n, edges, max_layers=32):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    residual = set(range(n))
    out = {}
    k, layer = 0, 0
    while residual:
        layer += 1
        if layer > max_layers:
            raise RuntimeError("depth")
        deg = {v: 0 for v in residual}
        for a, b in und:
            if a in residual and b in residual:
                deg[a] += 1
                deg[b] += 1
        k = max(k, min(deg.values()))
        peel = {v for v in residual if deg[v] <= k}
        for v in peel:
            out[v] = (k, layer)
        residual -= peel
    return out


def test_path_peels_outside_in(spark):
    # path 0-1-2-3-4: ends peel layer 1, then the new ends, then
    # the centre — all coreness 1
    edges = [(i, i + 1) for i in range(4)]
    got = _run(spark, 5, edges)
    assert got == {0: (1, 1), 4: (1, 1), 1: (1, 2), 3: (1, 2),
                   2: (1, 3)}
    assert got == _mirror(5, edges)


def test_clique_single_deep_pass(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _run(spark, 4, edges)
    assert all(v == (3, 1) for v in got.values())


def test_layers_refine_shared_coreness(spark):
    # a triangle with a pendant chain: chain is coreness 1 peeled
    # over two layers, triangle is coreness 2 in a later layer
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    got = _run(spark, 5, edges)
    assert got[4] == (1, 1) and got[3] == (1, 2)
    assert got[0][0] == 2 and got[1][0] == 2 and got[2][0] == 2
    assert got[0][1] == 3
    assert got == _mirror(5, edges)


def test_isolated_first(spark):
    got = _run(spark, 3, [(0, 1)])
    assert got[2] == (0, 1)


def test_depth_bound_raises(spark):
    edges = [(i, i + 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="max_layers"):
        _run(spark, 10, edges, max_layers=2)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(515)
    n = 35
    edges = list({(rng.randrange(n), rng.randrange(n))
                  for _ in range(80)})
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, n, edges)
    assert got == _mirror(n, edges)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n)])
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    out = con.execute(
        graph.onion_layers_sql("nd", "eg", max_layers=32)
    ).fetchall()
    assert {r[0]: (r[1], r[2]) for r in out} == got

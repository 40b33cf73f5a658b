"""Local clustering coefficient (graph.clustering_coeff) — planted
K3/K4/star/path graphs with closed-form coefficients, a Python mirror
on a random graph, DuckDB twin parity, and consistency with
triangle_counts."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ccoeff-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = graph.clustering_coeff(df).collect()
    return {
        r["node"]: (r["deg"], r["n_triangles"], r["coeff_ppm"])
        for r in rows
    }


def _python_coeff(edges):
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for v, nbrs in adj.items():
        deg = len(nbrs)
        tri = 0
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if ns[j] in adj.get(ns[i], ()):
                    tri += 1
        if deg < 2:
            c = None
        else:
            c = (tri * 2 * 1_000_000) // (deg * (deg - 1))
        out[v] = (deg, tri, c)
    return out


def test_triangle_is_fully_clustered(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    got = _run(spark, edges)
    assert got == {n: (2, 1, 1_000_000) for n in (1, 2, 3)}


def test_k4_is_fully_clustered(spark):
    """K4: deg 3, 3 triangles per node, 2·3/(3·2) = 1."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _run(spark, edges)
    assert got == {n: (3, 3, 1_000_000) for n in range(4)}


def test_star_center_zero_leaves_null(spark):
    """Star: center has wedges but no closures → 0; leaves deg 1 →
    NULL (undefined, not zero)."""
    edges = [(0, i) for i in range(1, 6)]
    got = _run(spark, edges)
    assert got[0] == (5, 0, 0)
    for leaf in range(1, 6):
        assert got[leaf] == (1, 0, None)


def test_triangle_with_pendant(spark):
    """Node 1 in a triangle plus a pendant: deg 3, 1 triangle →
    2·10⁶/6 truncated = 333333."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 9)]
    got = _run(spark, edges)
    assert got[1] == (3, 1, 333_333)
    assert got[2] == (2, 1, 1_000_000)
    assert got[9] == (1, 0, None)


def test_direction_and_dupes_ignored(spark):
    """Reversed duplicates and self-loops collapse before counting."""
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1)]
    got = _run(spark, edges)
    assert got == _python_coeff(edges)
    assert got[1] == (2, 1, 1_000_000)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(9182)
    edges = list({
        (rng.randrange(40), rng.randrange(40)) for _ in range(160)
    })
    want = _python_coeff(edges)
    assert _run(spark, edges) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE eg (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    rows = con.execute(graph.clustering_coeff_sql("eg")).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == want


def test_consistent_with_triangle_counts(spark):
    rng = random.Random(515)
    edges = list({
        (rng.randrange(25), rng.randrange(25)) for _ in range(80)
    })
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    tri = {
        r["node"]: r["n_triangles"]
        for r in graph.triangle_counts(df).collect()
    }
    cc = _run(spark, edges)
    for node, (_, n_tri, _) in cc.items():
        assert n_tri == tri.get(node, 0)

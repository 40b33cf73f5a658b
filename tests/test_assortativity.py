"""Degree assortativity (operators/graph.py degree_assortativity).

Newman's r as an exact sqrt-free integer ratio: on the symmetrized
edge list the two endpoint degree distributions coincide, so Pearson's
denominator is a single factor.
"""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("assort-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return graph.degree_assortativity(df).collect()[0]


def test_star_is_perfectly_disassortative(spark):
    """A star: every edge joins degree 10 to degree 1 → r = −1."""
    r = _run(spark, [(0, i) for i in range(1, 11)])
    assert r.assort_ppm == -1_000_000
    assert r.m_directed == 20


def test_regular_graph_is_undefined(spark):
    """A ring is degree-regular: zero degree variance → NULL, never a
    fake 0 or a division error."""
    r = _run(spark, [(i, (i + 1) % 10) for i in range(10)])
    assert r.assort_ppm is None


def test_disjoint_cliques_are_perfectly_assortative(spark):
    """Two cliques of different sizes: every edge joins equal degrees,
    and degrees VARY across the graph → r = +1."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(10 + a, 10 + b) for a in range(5) for b in range(a + 1, 5)]
    r = _run(spark, edges)
    assert r.assort_ppm == 1_000_000


def test_hub_with_pendants_negative(spark):
    """Clique + pendant leaves: mixed, but leaf edges dominate the
    correlation downward → strictly negative, > −1."""
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(i, 100 + i) for i in range(5)]
    r = _run(spark, edges)
    assert -1_000_000 < r.assort_ppm < 0


def test_self_loops_and_duplicates_ignored(spark):
    base = [(0, i) for i in range(1, 11)]
    noisy = base + [(3, 3), (7, 7)] + base[:4] + [(i, 0) for i in (1, 2)]
    assert tuple(_run(spark, base)) == tuple(_run(spark, noisy))


def test_duckdb_twin_matches(spark):
    edges = [((i * 7) % 23, (i * 13 + 5) % 23) for i in range(60)]
    edges += [(50, 51)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = tuple(graph.degree_assortativity(df).collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?,?)", edges)
    want = tuple(con.execute(
        graph.degree_assortativity_sql("e")).fetchone())
    assert got == want


def test_empty_graph(spark):
    r = _run(spark, [(1, 1)])  # only a self-loop → zero edges
    assert r.m_directed == 0 and r.assort_ppm is None

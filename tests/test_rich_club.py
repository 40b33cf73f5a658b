"""Rich-club coefficient (graph.rich_club) — clique-on-a-star reads
1.0, chain elite is sparse, undirected dedup + self-loop drop,
k-grid monotone membership, random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("rc-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, n_nodes, edges, k_list):
    nd = spark.createDataFrame([(i,) for i in range(n_nodes)],
                               "node long")
    eg = spark.createDataFrame(edges, "src long, dst long")
    out = graph.rich_club(nd, eg, k_list).collect()
    return {r.k: (r.n_rich, r.e_rich, r.phi_ppm) for r in out}


def _mirror(edges, k_list):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for k in sorted(set(k_list)):
        rich = {v for v, d in deg.items() if d > k}
        e = sum(1 for a, b in und if a in rich and b in rich)
        n = len(rich)
        phi = (None if n < 2
               else (2 * e * 10**6) // (n * (n - 1)))
        out[k] = (n, e, phi)
    return out


def test_clique_with_pendants_reads_full_club(spark):
    # triangle core {0,1,2} each with one pendant leaf: at k=1 the
    # core (degree 3) qualifies, leaves (degree 1) don't → φ = 1
    edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 4), (2, 5)]
    got = _run(spark, 6, edges, [1, 2])
    assert got[1] == (3, 3, 1_000_000)
    assert got[2] == (3, 3, 1_000_000)
    assert got == _mirror(edges, [1, 2])


def test_chain_elite_is_sparse(spark):
    # path 0-1-2-3-4-5: interior nodes have degree 2; at k=1 the
    # club is {1,2,3,4} with 3 internal edges of C(4,2)=6 → 0.5
    edges = [(i, i + 1) for i in range(5)]
    got = _run(spark, 6, edges, [1])
    assert got[1] == (4, 3, 500_000)


def test_dedup_and_self_loops(spark):
    edges = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2), (0, 2)]
    got = _run(spark, 3, edges, [0, 1])
    # undirected simple triangle: every degree 2
    assert got[0] == (3, 3, 1_000_000)
    assert got[1] == (3, 3, 1_000_000)
    assert got == _mirror(edges, [0, 1])


def test_empty_club_null(spark):
    edges = [(0, 1)]
    got = _run(spark, 2, edges, [5])
    assert got[5] == (0, 0, None)


def test_validation(spark):
    with pytest.raises(ValueError, match="k_list"):
        _run(spark, 2, [(0, 1)], [])
    with pytest.raises(ValueError, match=">= 0"):
        _run(spark, 2, [(0, 1)], [-1])


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(515151)
    n = 50
    edges = list({(rng.randrange(n), rng.randrange(n))
                  for _ in range(300)})
    ks = [0, 1, 2, 4, 8]
    got = _run(spark, n, edges, ks)
    assert got == _mirror(edges, ks)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n)])
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    out = con.execute(
        graph.rich_club_sql("nd", "eg", ks)
    ).fetchall()
    assert {r[0]: (r[1], r[2], r[3]) for r in out} == got

"""Katz centrality (graph.katz_quantized) — hand-walked small graphs,
hub-amplification vs PageRank's hub-dilution, growth guard, Python
integer mirror ≡ twin on a random graph."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("katz-tests", master="local[4]",
                    shuffle_partitions=8)


SCALE = 10**9


def _run(spark, node_ids, edge_pairs, iterations=3,
         atten=(5, 100)):
    nodes = spark.createDataFrame(
        [(n,) for n in node_ids], "node long"
    )
    edges = spark.createDataFrame(
        edge_pairs or [(0, 0)], "src long, dst long"
    )
    if not edge_pairs:
        edges = edges.where("false")
    out = graph.katz_quantized(
        nodes, edges, iterations=iterations,
        atten_num=atten[0], atten_den=atten[1],
    )
    return {r.node: r.katz_q for r in out.collect()}


def _mirror(node_ids, edge_pairs, iterations=3, atten=(5, 100)):
    num, den = atten
    x = {n: SCALE for n in node_ids}
    for _ in range(iterations):
        inc = {n: 0 for n in node_ids}
        for s, d in edge_pairs:
            inc[d] += x[s]
        x = {n: SCALE + (num * inc[n]) // den for n in node_ids}
    return x


def test_chain_hand_walked(spark):
    # 0→1→2, α=1/10, 2 rounds.  x₀=1e9 each.
    # r1: x(0)=1e9, x(1)=1e9+1e8, x(2)=1e9+1e8
    # r2: x(0)=1e9, x(1)=1.1e9, x(2)=1e9+(1.1e9)/10=1.11e9
    got = _run(spark, [0, 1, 2], [(0, 1), (1, 2)],
               iterations=2, atten=(1, 10))
    assert got == {0: SCALE, 1: 1_100_000_000, 2: 1_110_000_000}


def test_hub_amplifies_not_dilutes(spark):
    # star: 0..3 each → 4, and 4 → 5.  Katz gives node 5 the hub's
    # FULL attenuated score; PageRank would split nothing extra (the
    # hub has outdeg 1 both ways) — the discriminating case is the
    # hub itself: its Katz score stacks all four in-links undivided.
    nodes = list(range(6))
    edges = [(i, 4) for i in range(4)] + [(4, 5)]
    got = _run(spark, nodes, edges, iterations=2, atten=(1, 10))
    mir = _mirror(nodes, edges, iterations=2, atten=(1, 10))
    assert got == mir
    # hub got 4 full contributions: scale + 4·scale/10
    assert got[4] == SCALE + 4 * SCALE // 10
    # and 5 received the hub's grown score, not a split share
    assert got[5] == SCALE + (SCALE + 4 * SCALE // 10) // 10


def test_isolated_nodes_stay_at_base(spark):
    got = _run(spark, [7, 8], [], iterations=3)
    assert got == {7: SCALE, 8: SCALE}


def test_attenuation_guard(spark):
    with pytest.raises(ValueError, match="attenuation"):
        graph.katz_quantized(None, None, atten_num=0)
    with pytest.raises(ValueError, match="attenuation"):
        graph.katz_quantized(None, None, atten_num=100, atten_den=100)


def test_growth_cap_fires_loudly(spark):
    # self-amplifying 2-cycle with α close to 1 and a huge base:
    # after enough rounds the score passes 2^55 and the in-plan
    # assert must fire rather than wrap.
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 0)], "src long, dst long"
    )
    with pytest.raises(Exception, match="2\\^55"):
        graph.katz_quantized(
            nodes, edges, iterations=10,
            atten_num=99, atten_den=100, scale=10**16,
        ).collect()


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(99)
    node_ids = list(range(40))
    edge_pairs = sorted({
        (rng.randrange(40), rng.randrange(40)) for _ in range(120)
    } - {(i, i) for i in range(40)})
    got = _run(spark, node_ids, edge_pairs, iterations=4)
    assert got == _mirror(node_ids, edge_pairs, iterations=4)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(n,) for n in node_ids])
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?)", edge_pairs)
    out = con.execute(graph.katz_sql(
        "nd", "eg", iterations=4
    )).fetchall()
    assert dict(out) == got

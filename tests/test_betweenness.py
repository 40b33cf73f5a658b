"""Sampled Brandes betweenness (graph.betweenness_sampled) — hand-
walked path and diamond DAGs, star brokerage, hop-bound honesty,
random ≡ quantized Brandes mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("bc-tests", master="local[4]",
                    shuffle_partitions=8)


def _kmv(v):
    h = (v % 2**31) * 2654435761 % 2**32
    return (h ^ (h >> 16)) % 2**32


def _run(spark, n, edges, n_sources=4, rounds=6):
    nd = spark.createDataFrame([(i,) for i in range(n)], "node long")
    eg = spark.createDataFrame(edges, "src long, dst long")
    out = graph.betweenness_sampled(
        nd, eg, n_sources=n_sources, rounds=rounds
    ).collect()
    return {r.node: r.bc_q for r in out}


def _mirror(n, edges, n_sources=4, rounds=6):
    adj = {}
    for s, t in set(edges):
        if s != t or True:
            adj.setdefault(s, set()).add(t)
    pivots = sorted(range(n), key=lambda v: (_kmv(v), v))[:n_sources]
    bc = {v: 0 for v in range(n)}
    for s in pivots:
        dist = {s: 0}
        sigma = {s: 1}
        layers = [[s]]
        frontier = [s]
        for d in range(1, rounds + 1):
            nxt = {}
            for v in frontier:
                for w in adj.get(v, ()):
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[v]
            if not nxt:
                break
            for w, sg in nxt.items():
                dist[w] = d
                sigma[w] = sg
            layers.append(sorted(nxt))
            frontier = list(nxt)
        delta = {}
        for d in range(len(layers) - 1, 0, -1):
            nxt_delta = {}
            wset = set(layers[d])
            vset = set(layers[d - 1])
            for v in vset:
                tot = 0
                for w in adj.get(v, ()):
                    if w in wset:
                        tot += (sigma[v]
                                * (10**6 + delta.get(w, 0))) \
                            // sigma[w]
                if tot:
                    nxt_delta[v] = tot
            delta = {**{k: v for k, v in delta.items()
                        if k not in vset}, **nxt_delta}
            for v, dv in nxt_delta.items():
                if v != s:
                    bc[v] += dv
        # note: deltas for layer d-1 computed fresh each step; only
        # the freshly-computed layer contributes to bc
    return bc


def test_directed_path_hand_walk(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, 4, edges, n_sources=4, rounds=4)
    assert got == {0: 0, 1: 2_000_000, 2: 2_000_000, 3: 0}


def test_diamond_split(spark):
    # 0→1→3, 0→2→3: two shortest paths; middles split the mass
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _run(spark, 4, edges, n_sources=4, rounds=4)
    assert got[1] == 500_000 and got[2] == 500_000
    assert got[3] == 0 and got[0] == 0
    assert got == _mirror(4, edges, n_sources=4, rounds=4)


def test_star_center_brokers_everything(spark):
    # undirected star (both directions): all leaf→leaf paths run
    # through the center
    edges = []
    for leaf in range(1, 6):
        edges += [(0, leaf), (leaf, 0)]
    got = _run(spark, 6, edges, n_sources=6, rounds=4)
    assert got[0] == max(got.values())
    # each of 5 pivots... leaf pivots contribute 4·10⁶ to center
    assert got[0] == 5 * 4 * 10**6
    assert got == _mirror(6, edges, n_sources=6, rounds=4)


def test_hop_bound_honesty(spark):
    # rounds=1: no 2-hop paths exist, so nothing brokers
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, 4, edges, n_sources=4, rounds=1)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_validation(spark):
    with pytest.raises(ValueError, match="n_sources"):
        _run(spark, 2, [(0, 1)], n_sources=0)
    with pytest.raises(ValueError, match="rounds"):
        _run(spark, 2, [(0, 1)], rounds=0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(606060)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n))
                  for _ in range(90)})
    edges = [(s, t) for s, t in edges if s != t]
    got = _run(spark, n, edges, n_sources=4, rounds=5)
    assert got == _mirror(n, edges, n_sources=4, rounds=5)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n)])
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    out = con.execute(
        graph.betweenness_sql("nd", "eg", n_sources=4, rounds=5)
    ).fetchall()
    assert {r[0]: r[1] for r in out} == got

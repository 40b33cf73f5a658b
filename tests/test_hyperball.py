"""HyperBall centrality (graph.hyperball_centrality) — exact-regime
path/star/cycle harmonics, monotone ring deltas, estimator regime ≡
sketch mirror, random ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hb-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, n_nodes, edge_list, rounds=3, k=32):
    nodes = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "node long"
    )
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = graph.hyperball_centrality(
        nodes, edges, rounds=rounds, k=k
    ).collect()
    return {r.node: (r.ball_est, r.harm_q) for r in out}


def _kmv(v):
    h = (v % 2**31) * 2654435761 % 2**32
    return (h ^ (h >> 16)) % 2**32


def _mirror(n_nodes, edge_list, rounds=3, k=32):
    from math import gcd

    lcm = 1
    for d in range(1, rounds + 1):
        lcm = lcm * d // gcd(lcm, d)
    adj = {}
    for s, t in edge_list:
        adj.setdefault(s, []).append(t)
    sk = {v: [_kmv(v)] for v in range(n_nodes)}
    est = {v: 1 for v in range(n_nodes)}
    hq = {v: 0 for v in range(n_nodes)}
    for d in range(1, rounds + 1):
        new = {}
        for v in range(n_nodes):
            merged = set(sk[v])
            for w in adj.get(v, []):
                merged |= set(sk[w])
            new[v] = sorted(merged)[:k]
        for v in range(n_nodes):
            s = new[v]
            e = len(s) if len(s) < k \
                else ((k - 1) * 2**32) // max(s[k - 1], 1)
            hq[v] += (e - est[v]) * (lcm // d)
            est[v] = e
        sk = new
    return {v: (est[v], hq[v]) for v in range(n_nodes)}


def test_path_exact_harmonics(spark):
    # 0→1→2→3, r=3, L=6: h(0)=6+3+2=11, h(1)=9, h(2)=6, h(3)=0
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, 4, edges)
    assert got == {0: (4, 11), 1: (3, 9), 2: (2, 6), 3: (1, 0)}


def test_star_out_ball(spark):
    # hub 0 → 4 leaves: ball(0) = 5, h(0) = 4·L; leaves see nothing
    edges = [(0, i) for i in range(1, 5)]
    got = _run(spark, 5, edges)
    assert got[0] == (5, 4 * 6)
    for leaf in range(1, 5):
        assert got[leaf] == (1, 0)


def test_cycle_radius_truncation(spark):
    # 6-cycle at r=3: each node reaches 3 others, one per ring
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _run(spark, 6, edges)
    assert all(got[v] == (4, 6 + 3 + 2) for v in range(6))


def test_estimator_regime_matches_mirror(spark):
    # k=4 forces the estimator on any ball ≥ 4 — a dense random
    # graph exercises merges, kth-hash cuts, and the delta ladder
    rng = random.Random(77)
    n = 40
    edges = list({
        (rng.randrange(n), rng.randrange(n)) for _ in range(160)
    })
    edges = [(s, t) for s, t in edges if s != t]
    got = _run(spark, n, edges, rounds=4, k=4)
    assert got == _mirror(n, edges, rounds=4, k=4)
    # monotone deltas ⇒ harmonic never negative
    assert all(h >= 0 for _, h in got.values())


def test_validation(spark):
    with pytest.raises(ValueError, match="rounds"):
        _run(spark, 2, [(0, 1)], rounds=0)
    with pytest.raises(ValueError, match="k must"):
        _run(spark, 2, [(0, 1)], k=1)


def test_random_vs_twin(spark):
    rng = random.Random(424)
    n = 60
    edges = list({
        (rng.randrange(n), rng.randrange(n)) for _ in range(200)
    })
    edges = [(s, t) for s, t in edges if s != t]
    got = _run(spark, n, edges, rounds=4, k=8)
    assert got == _mirror(n, edges, rounds=4, k=8)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n)])
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    out = con.execute(
        graph.hyperball_sql("nd", "eg", rounds=4, k=8)
    ).fetchall()
    assert {r[0]: (r[1], r[2]) for r in out} == got

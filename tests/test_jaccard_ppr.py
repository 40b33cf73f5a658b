"""Neighborhood-Jaccard link prediction (graph.neighbor_jaccard_pairs)
and seeded personalized PageRank (graph.ppr_quantized) — planted
semantics, Python mirrors of the exact integer arithmetic, reduction
properties (PPR with all-node seeds ≡ global PageRank; unreachable
mass stays zero), guard edges, DuckDB twin parity."""

import random

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("jacppr-tests", master="local[4]",
                    shuffle_partitions=8)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def _con(**tables):
    con = duckdb.connect()
    for name, (rows, cols) in tables.items():
        con.register(name, con.from_df(pd.DataFrame(rows, columns=cols)))
    return con


# ------------------------------------------------------------- jaccard
def _py_jaccard(edges, min_common=1):
    nbrs = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    out = []
    nodes = sorted(nbrs)
    seen = {}
    for w, ns in nbrs.items():
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                seen[(ns[i], ns[j])] = seen.get((ns[i], ns[j]), 0) + 1
    for (a, b), c in seen.items():
        if c < min_common:
            continue
        da, db = len(nbrs[a]), len(nbrs[b])
        out.append((a, b, c, da, db, c * 10**6 // (da + db - c)))
    return sorted(out)


def test_jaccard_planted(spark):
    # 1-2 share {3,4}; deg(1)=deg(2)=2 -> jac = 2/(2+2-2) = 1.0
    edges = [(1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _canon(
        (r.id_a, r.id_b, r.n_common, r.deg_a, r.deg_b, r.jac_ppm)
        for r in graph.neighbor_jaccard_pairs(df).collect()
    )
    assert (1, 2, 2, 2, 2, 1_000_000) in got
    assert (3, 4, 2, 2, 2, 1_000_000) in got
    assert got == _py_jaccard(edges)


def test_jaccard_hub_discount(spark):
    # hub 1 has 10 neighbors, shares only {100} with node 2 (deg 2)
    edges = [(1, i) for i in range(100, 110)] + [(2, 100), (2, 105)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        (r.id_a, r.id_b): r.jac_ppm
        for r in graph.neighbor_jaccard_pairs(df).collect()
    }
    assert got[(1, 2)] == 2 * 10**6 // (10 + 2 - 2)  # 200000
    assert got == {k: v[5] for k, v in
                   ((tuple(r[:2]), r) for r in _py_jaccard(edges))}


def test_jaccard_self_loop_excluded(spark):
    edges = [(1, 1), (1, 2), (3, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _canon(
        (r.id_a, r.id_b, r.n_common, r.deg_a, r.deg_b, r.jac_ppm)
        for r in graph.neighbor_jaccard_pairs(df).collect()
    )
    assert got == _py_jaccard(edges) == [(1, 3, 1, 1, 1, 1_000_000)]


def test_jaccard_degree_guard(spark):
    edges = [(1, i) for i in range(2, 40)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    with pytest.raises(Exception, match="max_degree"):
        graph.neighbor_jaccard_pairs(df, max_degree=10).collect()


def test_jaccard_twin_random(spark):
    rng = random.Random(4406)
    edges = sorted({(rng.randrange(0, 60), rng.randrange(0, 60))
                    for _ in range(250)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _canon(
        (r.id_a, r.id_b, r.n_common, r.deg_a, r.deg_b, r.jac_ppm)
        for r in graph.neighbor_jaccard_pairs(df).collect()
    )
    assert got == _py_jaccard(edges)
    con = _con(e=(edges, ["src", "dst"]))
    twin = _canon(con.execute(graph.neighbor_jaccard_sql("e")).fetchall())
    assert got == twin


# ----------------------------------------------------------------- PPR
def _py_ppr(nodes, seeds, edges, iterations, damping_pct=85,
            scale=graph.PR_SCALE):
    outd = {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
    seeds = set(seeds)
    ns = len(seeds)
    base = (100 - damping_pct) * scale // 100
    r = {v: (scale if v in seeds else 0) for v in nodes}
    for _ in range(iterations):
        dang = sum(rv for v, rv in r.items() if v not in outd)
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + r[s] // outd[s]
        nr = {}
        for v in nodes:
            seeded = v in seeds
            nr[v] = (base if seeded else 0) + (
                damping_pct * (inc.get(v, 0)
                               + (dang // ns if seeded else 0))
            ) // 100
        r = nr
    return sorted(r.items())


def _spark_ppr(spark, nodes, seeds, edges, iterations):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    sdf = spark.createDataFrame([(n,) for n in seeds], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return sorted(
        (r.node, r.rank_q)
        for r in graph.ppr_quantized(
            ndf, sdf, edf, iterations=iterations
        ).collect()
    )


def test_ppr_mirror_planted(spark):
    nodes = list(range(8))
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (5, 6)]
    seeds = [0]
    got = _spark_ppr(spark, nodes, seeds, edges, 4)
    assert got == _py_ppr(nodes, seeds, edges, 4)
    r = dict(got)
    # mass never reaches the {3,4} cycle or isolated 7
    assert r[3] == r[4] == r[7] == 0
    assert r[0] > 0 and r[1] > 0 and r[2] > 0


def test_ppr_all_seeds_is_global_pagerank(spark):
    rng = random.Random(4407)
    nodes = list(range(20))
    edges = sorted({(rng.randrange(0, 20), rng.randrange(0, 20))
                    for _ in range(50)})
    edges = [(s, d) for s, d in edges if s != d]
    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    pr = sorted(
        (r.node, r.rank_q)
        for r in graph.pagerank_quantized(
            ndf, edf, iterations=4
        ).collect()
    )
    ppr = _spark_ppr(spark, nodes, nodes, edges, 4)
    assert pr == ppr


def test_ppr_empty_seeds_raises(spark):
    ndf = spark.createDataFrame([(0,)], "node bigint")
    edf = spark.createDataFrame([(0, 0)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="empty seed"):
        graph.ppr_quantized(ndf, ndf.where("node < 0"), edf)


def test_ppr_twin_random(spark):
    rng = random.Random(4408)
    nodes = list(range(30))
    edges = sorted({(rng.randrange(0, 30), rng.randrange(0, 30))
                    for _ in range(90)})
    edges = [(s, d) for s, d in edges if s != d]
    seeds = [0, 7, 19]
    got = _spark_ppr(spark, nodes, seeds, edges, 5)
    assert got == _py_ppr(nodes, seeds, edges, 5)
    con = _con(
        nd=([(n,) for n in nodes], ["node"]),
        sd=([(n,) for n in seeds], ["node"]),
        e=(edges, ["src", "dst"]),
    )
    twin = sorted(
        tuple(r)
        for r in con.execute(
            graph.ppr_sql("nd", "sd", "e", iterations=5)
        ).fetchall()
    )
    assert got == twin

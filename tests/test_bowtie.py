"""Bow-tie decomposition (graph.bowtie_classify) — the textbook
seven-region graph, giant-core tie-break, hop-bound honesty,
random ≡ BFS mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("bt-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, node_ids, edges, rounds=8):
    nd = spark.createDataFrame([(i,) for i in node_ids], "node long")
    eg = spark.createDataFrame(edges, "src long, dst long")
    out = graph.bowtie_classify(nd, eg, rounds=rounds).collect()
    return {r.node: r.cls for r in out}


def _mirror(node_ids, edges, rounds=8):
    nodes = list(node_ids)
    adj, radj = {}, {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
        radj.setdefault(t, set()).add(s)

    def bfs(seeds, a, limit):
        dist = {s: 0 for s in seeds}
        frontier = set(seeds)
        d = 0
        while frontier and (limit is None or d < limit):
            d += 1
            nxt = set()
            for v in frontier:
                for w in a.get(v, ()):
                    if w not in dist:
                        dist[w] = d
                        nxt.add(w)
            frontier = nxt
        return set(dist)

    # exact SCCs via UNBOUNDED closure (only the region BFS below
    # is hop-limited — matching the operator's contract)
    reach = {v: bfs([v], adj, None) for v in nodes}
    sccs = {}
    for v in nodes:
        mutual = [w for w in nodes if w in reach[v] and v in reach[w]]
        rep = min(mutual) if mutual else v
        sccs.setdefault(rep, set()).add(v)
    giant = max(sccs, key=lambda r: (len(sccs[r]), -r))
    core = sccs[giant]
    fwd = bfs(core, adj, rounds)
    bwd = bfs(core, radj, rounds)
    in_s = (bwd - core)
    out_s = (fwd - core)
    fi = bfs(in_s, adj, rounds) if in_s else set()
    to = bfs(out_s, radj, rounds) if out_s else set()
    cls = {}
    for v in nodes:
        if v in core:
            cls[v] = "core"
        elif v in bwd:
            cls[v] = "in"
        elif v in fwd:
            cls[v] = "out"
        elif v in fi and v in to:
            cls[v] = "tube"
        elif v in fi:
            cls[v] = "tendril_in"
        elif v in to:
            cls[v] = "tendril_out"
        else:
            cls[v] = "disconnected"
    return cls


TEXTBOOK_NODES = [0, 1, 10, 11, 12, 20, 21, 30, 40, 50, 60, 61]
TEXTBOOK_EDGES = [
    (10, 11), (11, 12), (12, 10),       # core cycle
    (0, 1), (1, 10),                    # in chain
    (12, 20), (20, 21),                 # out chain
    (1, 30), (30, 20),                  # tube bypassing the core
    (1, 40),                            # tendril off IN
    (50, 20),                           # tendril into OUT
    (60, 61),                           # disconnected pair
]


def test_textbook_regions(spark):
    got = _run(spark, TEXTBOOK_NODES, TEXTBOOK_EDGES)
    assert got == {
        10: "core", 11: "core", 12: "core",
        0: "in", 1: "in",
        20: "out", 21: "out",
        30: "tube", 40: "tendril_in", 50: "tendril_out",
        60: "disconnected", 61: "disconnected",
    }
    assert got == _mirror(TEXTBOOK_NODES, TEXTBOOK_EDGES)


def test_giant_tiebreak_smallest_member(spark):
    # two 2-cycles: {1,2} and {3,4} — same size, core = {1,2}
    nodes = [1, 2, 3, 4]
    edges = [(1, 2), (2, 1), (3, 4), (4, 3)]
    got = _run(spark, nodes, edges)
    assert got[1] == "core" and got[2] == "core"
    assert got[3] == "disconnected" and got[4] == "disconnected"


def test_hop_bound_honesty(spark):
    # at rounds=1 the 2-hop IN node reads disconnected — stated
    got = _run(spark, TEXTBOOK_NODES, TEXTBOOK_EDGES, rounds=1)
    assert got[1] == "in" and got[0] == "disconnected"
    assert got == _mirror(TEXTBOOK_NODES, TEXTBOOK_EDGES, rounds=1)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(9898)
    n = 40
    nodes = list(range(n))
    # a planted 6-cycle core plus random sparse edges
    edges = [(i, (i + 1) % 6) for i in range(6)]
    edges += list({(rng.randrange(n), rng.randrange(n))
                   for _ in range(50)})
    edges = [(s, t) for s, t in edges if s != t]
    got = _run(spark, nodes, edges, rounds=8)
    assert got == _mirror(nodes, edges, rounds=8)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in nodes])
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    out = con.execute(
        graph.bowtie_sql("nd", "eg", rounds=8)
    ).fetchall()
    assert {r[0]: r[1] for r in out} == got

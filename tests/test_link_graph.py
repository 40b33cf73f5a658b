"""Multi-source BFS (graph.link_distance) and fixed-round label
propagation (graph.label_spread) — Spark vs a plain-Python ground
truth of the same recurrences, plus the DuckDB SQL twins on random
graphs (reference parity: the bounded reachability/membership walks of
cascade.rb, re-expressed as relaxation rounds — see COVERAGE.md)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("link-graph-tests", master="local[4]",
                    shuffle_partitions=8)


# ---------------------------------------------------------------------------
# plain-Python ground truths
# ---------------------------------------------------------------------------

def _bfs_python(nodes, seeds, edges, rounds):
    dist = {v: (0 if v in seeds else None) for v in nodes}
    for _ in range(rounds):
        nd = {}
        for s, d in edges:
            if dist.get(s) is not None and d in dist:
                c = dist[s] + 1
                if d not in nd or c < nd[d]:
                    nd[d] = c
        for v, c in nd.items():
            if dist[v] is None or c < dist[v]:
                dist[v] = c
    return dist


def _spread_python(nodes, seed_labels, edges, rounds, bound=graph.LABEL_BOUND):
    lab = {v: seed_labels.get(v) for v in nodes}
    for _ in range(rounds):
        cnt = {}
        for s, d in edges:
            if lab.get(s) is not None and d in lab:
                cnt.setdefault(d, {})
                cnt[d][lab[s]] = cnt[d].get(lab[s], 0) + 1
        new = {}
        for v in nodes:
            if v in seed_labels:
                new[v] = seed_labels[v]
            elif v in cnt:
                new[v] = max(
                    cnt[v], key=lambda l: (cnt[v][l], -l)
                )
            else:
                new[v] = lab[v]
        lab = new
    return lab


def _spark_bfs(spark, nodes, seeds, edges, rounds):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    sdf = spark.createDataFrame([(v,) for v in seeds], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.node: r.dist
        for r in graph.link_distance(ndf, sdf, edf, rounds).collect()
    }


def _spark_spread(spark, nodes, seed_labels, edges, rounds):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    sdf = spark.createDataFrame(
        list(seed_labels.items()), "node bigint, label bigint"
    )
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.node: r.label
        for r in graph.label_spread(ndf, sdf, edf, rounds).collect()
    }


# ---------------------------------------------------------------------------
# link_distance
# ---------------------------------------------------------------------------

def test_bfs_chain_radius(spark):
    """On a 0→1→…→7 chain with seed {0}, dist after r rounds is the
    true distance up to r and NULL beyond — the hop-radius contract."""
    nodes = list(range(8))
    edges = [(i, i + 1) for i in range(7)]
    got = _spark_bfs(spark, nodes, [0], edges, rounds=4)
    assert got == {i: (i if i <= 4 else None) for i in nodes}


def test_bfs_multi_source_min(spark):
    """Two seeds; every node takes the NEARER one."""
    nodes = list(range(10))
    edges = [(i, i + 1) for i in range(9)]
    got = _spark_bfs(spark, nodes, [0, 9], edges, rounds=9)
    # edges are directed 0→9, so seed 9 only covers itself
    assert got == {i: (0 if i in (0, 9) else i) for i in nodes}


def test_bfs_frontier_short_circuit(spark):
    """Rounds beyond the diameter change nothing (the frontier drains
    and the loop exits early) — same fixpoint as exact-diameter run."""
    nodes = list(range(6))
    edges = [(i, i + 1) for i in range(5)]
    exact = _spark_bfs(spark, nodes, [0], edges, rounds=5)
    overshoot = _spark_bfs(spark, nodes, [0], edges, rounds=50)
    assert exact == overshoot == {i: i for i in nodes}


def test_bfs_random_vs_python_and_duckdb(spark):
    """Random digraph: Spark == plain-int recurrence == SQL twin."""
    rng = random.Random(421)
    nodes = list(range(40))
    edges = sorted({
        (rng.randrange(40), rng.randrange(40)) for _ in range(120)
    })
    edges = [e for e in edges if e[0] != e[1]]
    seeds = [3, 17, 31]
    want = _bfs_python(nodes, set(seeds), edges, rounds=4)
    got = _spark_bfs(spark, nodes, seeds, edges, rounds=4)
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE nd (node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)", [(v,) for v in nodes])
    con.execute("CREATE TABLE sd (node BIGINT)")
    con.executemany("INSERT INTO sd VALUES (?)", [(v,) for v in seeds])
    con.execute("CREATE TABLE eg (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    sql = graph.link_distance_sql("nd", "sd", "eg", rounds=4)
    twin = dict(con.execute(sql).fetchall())
    assert twin == want


# ---------------------------------------------------------------------------
# label_spread
# ---------------------------------------------------------------------------

def test_spread_mode_tie_breaks_low(spark):
    """Node 9 hears label 5 once and label 2 once → tie → LOWEST label
    wins; with a second vote for 5 the count wins over the tie-break."""
    nodes = [1, 2, 3, 9]
    seeds = {1: 5, 2: 2}
    got = _spark_spread(
        spark, nodes, seeds, [(1, 9), (2, 9)], rounds=1
    )
    assert got[9] == 2
    nodes2 = [1, 2, 3, 9]
    got2 = _spark_spread(
        spark, nodes2, {1: 5, 2: 2, 3: 5}, [(1, 9), (2, 9), (3, 9)],
        rounds=1,
    )
    assert got2[9] == 5


def test_spread_seeds_clamped(spark):
    """A seed surrounded by a different majority keeps its own label."""
    nodes = [0, 1, 2, 3]
    seeds = {0: 4, 1: 1, 2: 1}
    edges = [(1, 0), (2, 0), (0, 3)]
    got = _spark_spread(spark, nodes, seeds, edges, rounds=3)
    assert got[0] == 4 and got[3] == 4


def test_spread_label_zero_roundtrip(spark):
    """Label 0 survives the packed-argmax encode/decode."""
    got = _spark_spread(spark, [0, 1], {0: 0}, [(0, 1)], rounds=1)
    assert got[1] == 0


def test_spread_random_vs_python_and_duckdb(spark):
    """Random digraph + sparse seeds: Spark == Python == SQL twin."""
    rng = random.Random(1105)
    nodes = list(range(50))
    edges = sorted({
        (rng.randrange(50), rng.randrange(50)) for _ in range(200)
    })
    edges = [e for e in edges if e[0] != e[1]]
    seeds = {v: v % 6 for v in nodes if v % 7 == 0}
    want = _spread_python(nodes, seeds, edges, rounds=3)
    got = _spark_spread(spark, nodes, seeds, edges, rounds=3)
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE nd (node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)", [(v,) for v in nodes])
    con.execute("CREATE TABLE sd (node BIGINT, label BIGINT)")
    con.executemany("INSERT INTO sd VALUES (?, ?)", list(seeds.items()))
    con.execute("CREATE TABLE eg (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    sql = graph.label_spread_sql("nd", "sd", "eg", rounds=3)
    twin = dict(con.execute(sql).fetchall())
    assert twin == want


# ---------------------------------------------------------------------------
# common_neighbor_pairs
# ---------------------------------------------------------------------------

def _pairs_python(edges, mode, min_count):
    from collections import defaultdict

    groups = defaultdict(list)
    for s, d in edges:
        if mode == "cocitation":
            groups[s].append(d)
        else:
            groups[d].append(s)
    counts = defaultdict(int)
    for items in groups.values():
        its = sorted(items)
        for i in range(len(its)):
            for j in range(i + 1, len(its)):
                if its[i] != its[j]:
                    counts[(its[i], its[j])] += 1
    return {k: v for k, v in counts.items() if v >= min_count}


def _spark_pairs(spark, edges, mode, **kw):
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        (r.id_a, r.id_b): r.n_common
        for r in graph.common_neighbor_pairs(edf, mode, **kw).collect()
    }


def test_pairs_hand_case(spark):
    """u1 and u2 both cite {a, b}; u3 cites {a, c}."""
    edges = [(101, 1), (101, 2), (102, 1), (102, 2), (103, 1), (103, 3)]
    got = _spark_pairs(spark, edges, "cocitation")
    assert got == {(1, 2): 2, (1, 3): 1}
    # coupling: docs 101,102 share refs {1,2}; 103 shares {1}
    got2 = _spark_pairs(spark, edges, "coupling", min_count=2)
    assert got2 == {(101, 102): 2}


def test_pairs_degree_guard_fails_loud(spark):
    edges = [(0, d) for d in range(1, 40)]
    with pytest.raises(Exception, match="max_degree"):
        _spark_pairs(spark, edges, "cocitation", max_degree=10)


def test_pairs_random_vs_python_and_duckdb(spark):
    rng = random.Random(64)
    edges = sorted({
        (rng.randrange(25), rng.randrange(25)) for _ in range(100)
    })
    for mode in ("cocitation", "coupling"):
        want = _pairs_python(edges, mode, 1)
        got = _spark_pairs(spark, edges, mode)
        assert got == want
        con = duckdb.connect()
        con.execute("CREATE TABLE eg (src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
        twin = {
            (r[0], r[1]): r[2]
            for r in con.execute(
                graph.common_neighbor_pairs_sql("eg", mode)
            ).fetchall()
        }
        assert twin == want


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

def _triangles_python(edges):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    tris = set()
    for a, b in und:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted((a, b, c))))
    for t in tris:
        for v in t:
            counts[v] = counts.get(v, 0) + 1
    return counts


def _spark_triangles(spark, edges, **kw):
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.node: r.n_triangles
        for r in graph.triangle_counts(edf, **kw).collect()
    }


def test_triangles_hand_cases(spark):
    """A triangle with a pendant edge, plus a directed duplicate edge
    that must NOT double-count."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4)]
    got = _spark_triangles(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}
    # K4: every node sits in C(3,2) = 3 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _spark_triangles(spark, k4) == {i: 3 for i in range(4)}


def test_triangles_random_vs_python_and_duckdb(spark):
    rng = random.Random(19)
    edges = sorted({
        (rng.randrange(20), rng.randrange(20)) for _ in range(80)
    })
    want = _triangles_python(edges)
    got = _spark_triangles(spark, edges)
    assert got == want and want

    con = duckdb.connect()
    con.execute("CREATE TABLE eg (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    twin = dict(
        con.execute(graph.triangle_counts_sql("eg")).fetchall()
    )
    assert twin == want


def test_triangles_degree_guard(spark):
    # a wheel: hub 0 connected to a 30-cycle — after orientation the
    # effective degree stays small, so the guard does NOT fire at 10...
    wheel = [(0, i) for i in range(1, 31)] + [
        (i, i % 30 + 1) for i in range(1, 31)
    ]
    got = _spark_triangles(spark, wheel, max_degree=10)
    assert sum(got.values()) == 3 * 30  # 30 triangles × 3 nodes
    # ...but a clique's orientation cannot dodge the cap
    k12 = [(a, b) for a in range(12) for b in range(12) if a < b]
    with pytest.raises(Exception, match="max_degree"):
        _spark_triangles(spark, k12, max_degree=3)


# ---------------------------------------------------------------------------
# kcore
# ---------------------------------------------------------------------------

def _kcore_python(nodes, edges, k):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    alive = set(nodes)
    while True:
        deg = {}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        keep = {v for v in alive if deg.get(v, 0) >= k}
        if keep == alive:
            return {v: deg.get(v, 0) for v in keep}
        alive = keep
        if not alive:
            return {}


def _spark_kcore(spark, nodes, edges, k, **kw):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.node: r.degree
        for r in graph.kcore(ndf, edf, k, **kw).collect()
    }


def test_kcore_peel_cascade(spark):
    """A triangle with a tail: peeling the tail cascades (each removal
    exposes the next) but the triangle survives as the 2-core."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)]
    got = _spark_kcore(spark, list(range(1, 7)), edges, k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_core(spark):
    edges = [(1, 2), (2, 3)]
    assert _spark_kcore(spark, [1, 2, 3], edges, k=2) == {}


def test_kcore_nonconvergence_raises(spark):
    """A 30-chain at k=2 peels one end pair per round — max_rounds=3
    cannot converge and must raise, never return a wrong core."""
    edges = [(i, i + 1) for i in range(30)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _spark_kcore(spark, list(range(31)), edges, k=2, max_rounds=3)


def test_kcore_random_vs_python_and_duckdb(spark):
    rng = random.Random(23)
    nodes = list(range(30))
    edges = sorted({
        (rng.randrange(30), rng.randrange(30)) for _ in range(90)
    })
    edges = [e for e in edges if e[0] != e[1]]
    for k in (2, 3, 4):
        want = _kcore_python(nodes, edges, k)
        got = _spark_kcore(spark, nodes, edges, k)
        assert got == want
        con = duckdb.connect()
        con.execute("CREATE TABLE nd (node BIGINT)")
        con.executemany("INSERT INTO nd VALUES (?)", [(v,) for v in nodes])
        con.execute("CREATE TABLE eg (src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
        twin = dict(
            con.execute(graph.kcore_sql("nd", "eg", k)).fetchall()
        )
        assert twin == want


def test_kcore_self_loops_cannot_inflate_degree(spark):
    """Regression: the swapped symmetrization branch used to leak
    self-loops past the src≠dst filter, inflating that node's degree
    by one vs the DuckDB twin.  A triangle + a self-loop on a pendant
    must peel the pendant at k=2."""
    nodes = [0, 1, 2, 3]
    edges = [(0, 1), (1, 2), (2, 0), (3, 3), (0, 3)]
    got = _spark_kcore(spark, nodes, edges, k=2)
    assert set(got) == {0, 1, 2}
    con = duckdb.connect()
    con.execute("CREATE TABLE nd2 (node BIGINT)")
    con.executemany("INSERT INTO nd2 VALUES (?)", [(v,) for v in nodes])
    con.execute("CREATE TABLE eg2 (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg2 VALUES (?, ?)", edges)
    twin = dict(con.execute(graph.kcore_sql("nd2", "eg2", 2)).fetchall())
    assert twin == got

"""Directed-graph structural profile (graph.link_graph_profile) —
hand-built graph with every feature planted (self-loop, duplicate
edge, reciprocal pair, source, sink, isolate), reciprocity edge
cases, random ≡ Python mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gprofile-tests", master="local[4]",
                    shuffle_partitions=8)


COLS = ("n_nodes", "n_edges", "n_self_loops", "n_dup_edges",
        "n_distinct_edges", "reciprocity_ppm", "n_sources",
        "n_sinks", "n_isolates", "max_out_deg", "max_in_deg")


def _run(spark, n_nodes, edges):
    ndf = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "node long"
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    row = graph.link_graph_profile(ndf, edf).collect()[0]
    return tuple(getattr(row, c) for c in COLS)


def _mirror(n_nodes, edges):
    from collections import Counter

    dedup = Counter(edges)
    n_edges = len(edges)
    n_dup = sum(m - 1 for m in dedup.values())
    n_dist = len(dedup)
    loops = [(s, d) for s, d in dedup if s == d]
    n_loops = sum(dedup[e] for e in loops)
    pairs = Counter()
    for s, d in dedup:
        if s != d:
            pairs[(min(s, d), max(s, d))] += 1
    recip = sum(1 for v in pairs.values() if v == 2)
    denom = n_dist - len(loops)
    rec_ppm = None if denom == 0 else (recip * 2 * 1_000_000) // denom
    od, idg = {}, {}
    for (s, d), m in dedup.items():
        od[s] = od.get(s, 0) + m
        idg[d] = idg.get(d, 0) + m
    n_sources = sum(1 for v in range(n_nodes)
                    if v in od and v not in idg)
    n_sinks = sum(1 for v in range(n_nodes)
                  if v in idg and v not in od)
    n_iso = sum(1 for v in range(n_nodes)
                if v not in od and v not in idg)
    return (n_nodes, n_edges, n_loops, n_dup, n_dist, rec_ppm,
            n_sources, n_sinks, n_iso,
            max([od.get(v, 0) for v in range(n_nodes)], default=0),
            max([idg.get(v, 0) for v in range(n_nodes)], default=0))


def test_all_features_planted(spark):
    # 0→1 (dup ×2), 1→0 (reciprocal), 2→2 (self-loop), 3→4
    # (source 3, sink 4), 5 isolate
    edges = [(0, 1), (0, 1), (1, 0), (2, 2), (3, 4)]
    got = _run(spark, 6, edges)
    assert got == _mirror(6, edges)
    n_nodes, n_edges, loops, dups, dist, rec, src, snk, iso, mo, mi \
        = got
    assert (n_nodes, n_edges, loops, dups, dist) == (6, 5, 1, 1, 4)
    # distinct non-loop edges = 3, one reciprocated pair → 2/3
    assert rec == 666_666
    assert (src, snk, iso) == (1, 1, 1)


def test_all_loops_null_reciprocity(spark):
    edges = [(0, 0), (1, 1)]
    got = _run(spark, 2, edges)
    assert got[5] is None


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(112)
    n = 30
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    got = _run(spark, n, edges)
    assert got == _mirror(n, edges)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n)])
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    row = con.execute(
        graph.link_graph_profile_sql("nd", "eg")
    ).fetchall()[0]
    assert tuple(row) == got

"""DAG levels / longest-path depth (graph.dag_levels) — chain and
diamond plants, deeper-than-budget NULL, cycle NULL (never a wrong
number), frontier short-circuit exactness, random DAG ≡ topological
mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("dagl-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, n_nodes, edges, rounds):
    nodes = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "node long"
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = graph.dag_levels(nodes, edf, rounds=rounds).collect()
    return {r.node: r.level for r in out}


def _mirror(n_nodes, edges, rounds):
    """min(longest chain ending at v, rounds), NULL if > rounds —
    iterate the max-plus recurrence rounds+1 times (cycle-safe)."""
    lvl = {v: 0 for v in range(n_nodes)}
    for _ in range(rounds + 1):
        new = dict(lvl)
        for s, d in edges:
            new[d] = max(new[d], lvl[s] + 1)
        lvl = new
    return {
        v: (None if lvl[v] > rounds else lvl[v])
        for v in range(n_nodes)
    }


def test_chain_and_diamond(spark):
    # 0→1→2→3 chain; 0→4, 4→3 diamond arm: level(3) = 3 (longest)
    edges = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3)]
    got = _run(spark, 5, edges, rounds=6)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1}


def test_deeper_than_budget_null(spark):
    edges = [(i, i + 1) for i in range(8)]
    got = _run(spark, 9, edges, rounds=4)
    assert got[4] == 4
    assert got[5] is None and got[8] is None


def test_cycle_feeds_null_not_wrong(spark):
    # 0↔1 cycle feeding 2; isolated 3 stays exact
    edges = [(0, 1), (1, 0), (1, 2)]
    got = _run(spark, 4, edges, rounds=5)
    assert got[0] is None and got[1] is None and got[2] is None
    assert got[3] == 0


def test_settled_graph_no_nulls(spark):
    # longest chain 2 < rounds: frontier empties → everything exact
    edges = [(0, 1), (1, 2)]
    got = _run(spark, 3, edges, rounds=10)
    assert got == {0: 0, 1: 1, 2: 2}


def test_random_dag_vs_mirror_and_twin(spark):
    rng = random.Random(2112)
    n = 40
    edges = sorted({
        (a, b)
        for _ in range(90)
        for a, b in [sorted(rng.sample(range(n), 2))]
    })
    rounds = 5
    got = _run(spark, n, edges, rounds)
    assert got == _mirror(n, edges, rounds)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n)])
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    rows = con.execute(
        graph.dag_levels_sql("nd", "eg", rounds)
    ).fetchall()
    assert {r[0]: r[1] for r in rows} == got


def test_random_with_cycles_vs_mirror(spark):
    rng = random.Random(99)
    n = 25
    edges = sorted({
        (rng.randrange(n), rng.randrange(n)) for _ in range(45)
    })
    edges = [(a, b) for a, b in edges if a != b]
    rounds = 4
    got = _run(spark, n, edges, rounds)
    assert got == _mirror(n, edges, rounds)

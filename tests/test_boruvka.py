"""Parallel Borůvka MSF (graph.boruvka_msf) — hand-pinned trees,
total-order tie uniqueness, forest over disconnected graphs,
self-loop/parallel-edge hygiene, loud non-convergence, random ≡
Kruskal union-find mirror ≡ DuckDB Kruskal-invariant twin (a
different algorithm family on each of the three legs)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("boruvka-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "id_a long, id_b long, w long"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = graph.boruvka_msf(df, **kw).collect()
    return sorted((r.id_a, r.id_b, r.w) for r in out)


def _kruskal(rows):
    """Sequential Kruskal with union-find — the mirror family."""
    canon = {}
    for a, b, w in rows:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        canon[k] = min(canon.get(k, w), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def test_hand_pinned_tree(spark):
    # classic 4-node example: MST = {ab(1), bc(2), bd(3)}
    rows = [(1, 2, 1), (2, 3, 2), (1, 3, 4), (2, 4, 3), (3, 4, 5)]
    assert _run(spark, rows) == [(1, 2, 1), (2, 3, 2), (2, 4, 3)]
    assert _run(spark, rows) == _kruskal(rows)


def test_equal_weights_unique_under_total_order(spark):
    # 4-cycle, all weights equal: the (w, a, b) order keeps
    # (1,2),(1,4),(2,3) and drops (3,4)
    rows = [(1, 2, 7), (2, 3, 7), (3, 4, 7), (1, 4, 7)]
    got = _run(spark, rows)
    assert got == [(1, 2, 7), (1, 4, 7), (2, 3, 7)]
    assert got == _kruskal(rows)


def test_forest_over_disconnected_components(spark):
    rows = [(1, 2, 1), (2, 3, 2), (10, 11, 1), (11, 12, 9),
            (10, 12, 5)]
    got = _run(spark, rows)
    assert got == [(1, 2, 1), (2, 3, 2), (10, 11, 1), (10, 12, 5)]
    assert got == _kruskal(rows)


def test_self_loops_and_parallel_edges(spark):
    rows = [(1, 1, 0), (1, 2, 9), (2, 1, 3), (2, 3, 4), (3, 2, 8)]
    got = _run(spark, rows)
    assert got == [(1, 2, 3), (2, 3, 4)]
    assert got == _kruskal(rows)


def test_nonconvergence_raises(spark):
    # weights force round-1 chosen edges into a perfect matching,
    # so one round cannot finish the 8-node path
    rows = [(1, 2, 1), (2, 3, 100), (3, 4, 2), (4, 5, 101),
            (5, 6, 3), (6, 7, 102), (7, 8, 4)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(RuntimeError, match="max_rounds"):
        graph.boruvka_msf(df, max_rounds=1)
    assert _run(spark, rows, max_rounds=4) == _kruskal(rows)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(1717)
    rows = []
    for _ in range(120):
        a, b = rng.randrange(40), rng.randrange(40)
        rows.append((a, b, rng.randrange(1, 30)))
    got = _run(spark, rows)
    assert got == _kruskal(rows)

    con = duckdb.connect()
    con.execute("CREATE TABLE e(id_a BIGINT, id_b BIGINT, w BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    twin = sorted(
        tuple(r) for r in
        con.execute(graph.boruvka_msf_sql("e")).fetchall()
    )
    assert twin == got

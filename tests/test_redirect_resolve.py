"""Redirect-chain resolution (graph.redirect_resolve): planted
chains / loops / loop-feeding tails / off-corpus terminals, the loud
functional-graph guard, a Python-walk mirror on a random functional
graph, and DuckDB twin parity on the contract's synthetic edge map."""

import random

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("redirect-tests", master="local[4]",
                    shuffle_partitions=8)


def _canon(rows):
    return sorted(tuple("∅" if v is None else v for v in r) for r in rows)


def _resolve(spark, ids, edges):
    nodes = spark.createDataFrame([(i,) for i in ids], "id bigint")
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r.id: (r.canonical, r.hops, r.is_cycle)
        for r in graph.redirect_resolve(nodes, e).collect()
    }


def test_planted_shapes(spark):
    # chain 1→2→3 (3 terminal), loop 10↔11, tail 12→10 into the loop,
    # off-corpus hop 20→99 (99 only a dst → terminal), isolated 30
    got = _resolve(
        spark,
        [1, 2, 3, 10, 11, 12, 20, 30],
        [(1, 2), (2, 3), (10, 11), (11, 10), (12, 10), (20, 99)],
    )
    assert got[1] == (3, 2, False)
    assert got[2] == (3, 1, False)
    assert got[3] == (3, 0, False)          # canonical resolves to itself
    assert got[10] == (None, None, True)    # on the loop
    assert got[11] == (None, None, True)
    assert got[12] == (None, None, True)    # drains into the loop
    assert got[20] == (99, 1, False)        # off-corpus terminal counts
    assert got[30] == (30, 0, False)        # no redirect at all


def test_long_chain_needs_doubling(spark):
    # a 40-hop chain: one-hop-per-round would need 40 rounds; the
    # round budget is ceil(log2(41))+... = 6, so only doubling lands it
    n = 40
    got = _resolve(spark, list(range(n + 1)),
                   [(i, i + 1) for i in range(n)])
    assert got[0] == (n, n, False)
    assert got[n] == (n, 0, False)


def test_nonfunctional_guard(spark):
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id bigint")
    e = spark.createDataFrame([(1, 2), (1, 3)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="functional"):
        graph.redirect_resolve(nodes, e)


def _py_resolve(ids, edges):
    nxt = dict(edges)
    out = {}
    universe = set(ids) | set(nxt) | set(nxt.values())
    for i in ids:
        cur, hops = i, 0
        while cur in nxt and hops <= len(universe):
            cur, hops = nxt[cur], hops + 1
        if cur in nxt:  # never escaped: loop
            out[i] = (None, None, True)
        else:
            out[i] = (cur, hops, False)
    return out


def test_random_functional_graph_vs_python_walk(spark):
    rng = random.Random(20260819)
    ids = list(range(120))
    edges = []
    for i in ids:
        r = rng.random()
        if r < 0.15:
            continue                          # terminal
        if r < 0.25:
            edges.append((i, rng.randrange(120, 140)))  # off-corpus
        else:
            edges.append((i, rng.randrange(120)))       # may form loops
    got = _resolve(spark, ids, edges)
    assert got == _py_resolve(ids, edges)
    assert any(v[2] for v in got.values())    # the seed plants loops
    assert any(not v[2] and v[1] and v[1] >= 2 for v in got.values())


def test_twin_parity_on_contract_map(spark):
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = _canon(entrymod.queries()["redirect_resolve"](spark, sf)
                 .collect())
    con = duckdb.connect()
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    con.register("documents", con.from_df(docs))
    twin = _canon(
        con.execute(entrymod.oracle_sql()["redirect_resolve"]).fetchall()
    )
    assert got == twin
    # the planted pathologies are present at every sf: cycles exist,
    # tails inherit the verdict, chains resolve to multiples of 5
    by_id = {r[0]: r for r in got}
    assert by_id[3][3] is True and by_id[23][3] is True
    assert by_id[9] == (9, 5, 4, False)

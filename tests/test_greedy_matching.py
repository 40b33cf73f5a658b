"""Greedy maximal matching (graph.greedy_matching) — equivalence to
sequential best-first greedy (the lexicographically-first MM),
one-to-one coverage, hygiene, loud chain exhaustion, random ≡
sequential mirror ≡ DuckDB unrolled-rounds twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.operators import graph  # noqa
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("matching-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "id_a long, id_b long, w long"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = graph.greedy_matching(df, **kw).collect()
    return sorted((r.id_a, r.id_b, r.w) for r in out)


def _sequential(rows):
    """Best-first sequential greedy — the cross-family mirror."""
    canon = {}
    for a, b, w in rows:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        canon[k] = min(canon.get(k, w), w)
    used = set()
    out = []
    for (a, b), w in sorted(canon.items(),
                            key=lambda kv: (kv[1], kv[0])):
        if a not in used and b not in used:
            used.update((a, b))
            out.append((a, b, w))
    return sorted(out)


def test_best_first_conflict(spark):
    # edges (1,2,w5) and (2,3,w1): greedy takes (2,3); 1 stays single
    rows = [(1, 2, 5), (2, 3, 1)]
    got = _run(spark, rows)
    assert got == [(2, 3, 1)]
    assert got == _sequential(rows)


def test_one_to_one_and_maximal(spark):
    rows = [(1, 2, 1), (3, 4, 1), (2, 3, 0), (1, 4, 2)]
    got = _run(spark, rows)
    # (2,3) first, then (1,4): every node covered exactly once
    assert got == [(1, 4, 2), (2, 3, 0)]
    assert got == _sequential(rows)


def test_hygiene(spark):
    rows = [(2, 2, 0), (2, 1, 7), (1, 2, 3)]
    got = _run(spark, rows)
    assert got == [(1, 2, 3)]
    assert got == _sequential(rows)


def test_chain_exhaustion_raises(spark):
    # monotone chain: one local-min edge per round
    chain = [(i, i + 1, i) for i in range(1, 12)]
    df = spark.createDataFrame(chain, SCHEMA)
    with pytest.raises(RuntimeError, match="max_rounds"):
        graph.greedy_matching(df, max_rounds=2)
    assert _run(spark, chain, max_rounds=12) == _sequential(chain)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(606)
    rows = list({
        (rng.randrange(40), rng.randrange(40), rng.randrange(1, 50))
        for _ in range(150)
    })
    got = _run(spark, rows)
    assert got == _sequential(rows)
    matched_nodes = [n for a, b, _ in got for n in (a, b)]
    assert len(matched_nodes) == len(set(matched_nodes))

    con = duckdb.connect()
    con.execute("CREATE TABLE e(id_a BIGINT, id_b BIGINT, w BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    twin = sorted(
        tuple(r) for r in
        con.execute(graph.greedy_matching_sql("e")).fetchall()
    )
    assert twin == got

"""Sorted-neighborhood blocking (dedup.sorted_neighborhood_pairs) —
exact window-pair semantics, exactly-once forward block fan (no
distinct), duplicate-key determinism, skew guard, empty input, random
≡ Python mirror ≡ DuckDB twin, no-global-window plan pin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import dedup


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("sortnbr-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, window=5, **kw):
    df = spark.createDataFrame(rows, "id long, k long")
    out = dedup.sorted_neighborhood_pairs(
        df, "id", "k", window=window, **kw
    ).collect()
    return sorted((r.id_a, r.id_b, r.key_a, r.key_b, r.rank_gap)
                  for r in out)


def _mirror(rows, window=5):
    order = sorted((k, i) for i, k in rows)
    out = []
    for a in range(len(order)):
        for b in range(a + 1, min(a + window, len(order))):
            out.append((order[a][1], order[b][1],
                        order[a][0], order[b][0], b - a))
    return sorted(out)


def test_window_pairs_exact(spark):
    rows = [(i, i * 10) for i in range(6)]
    got = _run(spark, rows, window=3)
    assert got == _mirror(rows, window=3)
    # each interior row pairs with the next 2 ranks
    assert len(got) == 4 + 3 + 2  # gaps of 1 (5 pairs) + 2 (4 pairs)


def test_pairs_emitted_exactly_once(spark):
    rows = [(i, i) for i in range(40)]
    got = _run(spark, rows, window=7)
    assert len(got) == len(set(got)) == len(_mirror(rows, window=7))


def test_duplicate_keys_deterministic(spark):
    rows = [(3, 5), (1, 5), (2, 5)]
    got = _run(spark, rows, window=2)
    # ties ordered by id: 1,2,3 → pairs (1,2), (2,3)
    assert [(a, b) for a, b, *_ in got] == [(1, 2), (2, 3)]


def test_skew_guard_fires(spark):
    rows = [(i, 7) for i in range(30)]
    with pytest.raises(Exception, match="max_bucket_rows"):
        _run(spark, rows, window=3, n_buckets=4, max_bucket_rows=5)


def test_empty_input(spark):
    assert _run(spark, [], window=3) == []


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(998)
    rows = [(i, rng.randrange(0, 500)) for i in range(300)]
    got = _run(spark, rows, window=6)
    assert got == _mirror(rows, window=6)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(dedup.sorted_neighborhood_sql(
        "t", "id", "k", window=6
    )).fetchall()
    assert sorted(tuple(r) for r in out) == got


def test_no_single_partition_window_plan(spark):
    rows = [(i, i % 9) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, k long")
    plan = dedup.sorted_neighborhood_pairs(
        df, "id", "k", window=4
    )._jdf.queryExecution().executedPlan().toString()
    # the rank window is value-bucket-partitioned; the returned plan
    # must never collapse to one partition (the global-window trap)
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan  # and the two-level rank is really there

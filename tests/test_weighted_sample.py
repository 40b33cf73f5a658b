"""Replica-minimum weighted sampling (sampling.weighted_sample) —
zero-weight exclusion, weight monotonicity, shard mergeability,
cap guard, plan shape, and Python + DuckDB twin parity."""

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import sampling, sketches


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("wsample-tests", master="local[4]",
                    shuffle_partitions=8)


def _mix(v):
    h = (v % 2_147_483_648) * 2654435761 % 4_294_967_296
    return (h ^ (h >> 16)) % 4_294_967_296


def _python_ws(items, n):
    best = {}
    for i, w in items:
        if w > 0:
            best[i] = (
                min(_mix(i * sampling.WS_REPLICA_PRIME + r)
                    for r in range(w)),
                w,
            )
    ranked = sorted(best.items(), key=lambda kv: (kv[1][0], kv[0]))
    return [(i, w, p) for i, (p, w) in ranked[:n]]


def _run(spark, items, n, **kw):
    df = spark.createDataFrame(items, "doc_id bigint, n_tokens bigint")
    return [
        tuple(r)
        for r in sampling.weighted_sample(
            df, n=n, weight_col="n_tokens", **kw
        ).collect()
    ]


def test_matches_python_and_zero_weight_excluded(spark):
    items = [(i, (i * 13) % 9) for i in range(60)]  # some weights 0
    got = _run(spark, items, n=15)
    want = _python_ws(items, 15)
    assert got == want
    zero_ids = {i for i, w in items if w == 0}
    assert not zero_ids & {r[0] for r in got}


def test_weight_monotone_priority(spark):
    """Raising an item's weight can only lower (improve) its priority
    — min over a superset of replicas."""
    lo = dict(
        (r[0], r[2])
        for r in _run(spark, [(i, 3) for i in range(30)], 30)
    )
    hi = dict(
        (r[0], r[2])
        for r in _run(spark, [(i, 9) for i in range(30)], 30)
    )
    assert all(hi[i] <= lo[i] for i in lo)


def test_shard_mergeable(spark):
    """Priorities merge across corpus shards: min per id over shard
    priorities, then bottom-n == single-pass result (weights split
    per shard replicate the replica range via disjoint r offsets is
    NOT claimed — shards here carry disjoint ITEMS, the partition
    case an actual corpus split produces)."""
    items = [(i, 1 + i % 7) for i in range(40)]
    whole = _run(spark, items, n=10)
    part1 = _run(spark, items[:20], n=10)
    part2 = _run(spark, items[20:], n=10)
    merged = sorted(part1 + part2, key=lambda t: (t[2], t[0]))[:10]
    assert whole == merged


def test_cap_guard_fails_loud(spark):
    df = spark.createDataFrame(
        [(1, 10_000)], "doc_id bigint, n_tokens bigint"
    )
    with pytest.raises(Exception, match="max_weight"):
        sampling.weighted_sample(
            df, n=5, weight_col="n_tokens", max_weight=100
        ).collect()


def test_plan_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, 3) for i in range(10)], "doc_id bigint, n_tokens bigint"
    )
    plan = (
        sampling.weighted_sample(df, n=3, weight_col="n_tokens")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_duckdb_twin_parity(spark):
    items = [(i * 7, 1 + (i * 5) % 11) for i in range(50)]
    got = _run(spark, items, n=12)
    con = duckdb.connect()
    con.execute("CREATE TABLE w (doc_id BIGINT, n_tokens BIGINT)")
    con.executemany("INSERT INTO w VALUES (?, ?)", items)
    twin = [
        tuple(r)
        for r in con.execute(
            sampling.weighted_sample_sql("w", n=12, weight_col="n_tokens")
        ).fetchall()
    ]
    assert got == twin

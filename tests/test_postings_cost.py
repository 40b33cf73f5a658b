"""Varint posting-list costing (operators/textops.py).

postings_varint_cost = the index-size planner: exact LEB128 byte cost
of delta-gap posting lists per token, the budget a 10¹²-doc index
build needs before materializing anything.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("postings-cost-tests", master="local[4]",
                    shuffle_partitions=8)


def test_varint_boundaries(spark):
    """Every 7-bit group boundary: 2^(7k)−1 is k bytes, 2^(7k) is
    k+1 — and the int64 max is the 9-byte ceiling."""
    vals = []
    for k in range(1, 9):
        vals.append(((1 << (7 * k)) - 1, k))
        vals.append((1 << (7 * k), k + 1))
    vals += [(0, 1), (2**63 - 1, 9)]
    df = spark.createDataFrame([(v,) for v, _ in vals], "v bigint")
    got = {r.v: r.b for r in df.select(
        "v", textops.varint_bytes(F.col("v")).alias("b")).collect()}
    for v, want in vals:
        assert got[v] == want, (v, got[v], want)
    con = duckdb.connect()
    for v, want in vals:
        assert con.execute(
            f"SELECT {textops.varint_bytes_sql(str(v))}"
        ).fetchone()[0] == want, v


def test_hand_computed_bytes(spark):
    """Three docs {1, 2, 130} with tf=1 each, one shard: absolute 1
    (1B) + gap 1 (1B) + gap 128 (2B) + three tf=1 (3B) = 7 bytes."""
    rows = [(1, "zzz"), (2, "zzz"), (130, "zzz")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = textops.postings_varint_cost(df, shard_size=1024,
                                       min_docs=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.token, r.n_docs, r.n_shards, r.sum_tf) == ("zzz", 3, 1, 3)
    assert r.varint_bytes == 7
    assert r.ratio_ppm == 7 * 1_000_000 // (3 * 16)


def test_locality_not_just_frequency(spark):
    """Two tokens with IDENTICAL document frequency: the one on
    consecutive doc ids (gap 1 → 1 byte) must cost strictly less than
    the one scattered at stride 5000 (gap 5000 → 2 bytes)."""
    rows = [(i, "dense") for i in range(100)] + \
           [(i * 5000, "sparse") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.token: r for r in textops.postings_varint_cost(
        df, shard_size=10**9, min_docs=2).collect()}
    assert out["dense"].n_docs == out["sparse"].n_docs == 100
    assert out["dense"].varint_bytes < out["sparse"].varint_bytes


def test_sharding_resets_gaps(spark):
    """A shard boundary restarts absolute encoding: with shard_size=50
    the stride-5000 list pays a multi-byte ABSOLUTE id per shard
    (every doc its own shard) — n_shards is the audit column."""
    rows = [(i * 5000, "sparse") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    one = textops.postings_varint_cost(
        df, shard_size=10**9, min_docs=2).collect()[0]
    many = textops.postings_varint_cost(
        df, shard_size=50, min_docs=2).collect()[0]
    assert one.n_shards == 1 and many.n_shards == 100
    assert many.varint_bytes > one.varint_bytes  # absolutes beat gaps


def test_min_docs_filters(spark):
    rows = [(1, "common a"), (2, "common b"), (3, "common c")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    toks = {r.token for r in textops.postings_varint_cost(
        df, min_docs=3).collect()}
    assert toks == {"common"}


def test_duckdb_twin_matches(spark):
    rows = [(i, ("the quick fox " * (i % 3 + 1))
             + (f"rare{i} " if i % 7 == 0 else "") + "jumps")
            for i in range(200)]
    rows.append((10**12 + 5, "the zebra"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(map(tuple, textops.postings_varint_cost(
        df, shard_size=64, min_docs=2).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = sorted(map(tuple, con.execute(
        textops.postings_varint_cost_sql(
            "t", shard_size=64, min_docs=2)).fetchall()))
    assert got == want


def test_plan_single_partitioned_window(spark):
    """The lag window must partition by (token, shard) — never a
    global window — and the rollup must map-side combine."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c a").alias("text"),
    )
    plan = textops.postings_varint_cost(df)._jdf.queryExecution() \
        .executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(token#" in line, line
    assert "partial_sum" in plan

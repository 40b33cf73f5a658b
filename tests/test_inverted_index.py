"""Sharded delta-encoded inverted index (textops.inverted_index) —
lossless round-trip decode, shard bounding, shared-partitioning plan
shape, and DuckDB twin parity."""

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("invidx-tests", master="local[4]", shuffle_partitions=8)


def _decode(shard_rows):
    """postings 'doc:tf,+gap:tf,...' → {(doc, tf), ...} per token."""
    out = {}
    for token, shard, n_docs, sum_tf, postings in shard_rows:
        doc = None
        entries = postings.split(",")
        assert len(entries) == n_docs
        total = 0
        for e in entries:
            d, tf = e.split(":")
            doc = doc + int(d[1:]) if d.startswith("+") else int(d)
            out.setdefault(token, set()).add((doc, int(tf)))
            total += int(tf)
        assert total == sum_tf
    return out


def test_round_trip_lossless(spark):
    rng = random.Random(31)
    vocab = ["ant", "bee", "cat", "dog", "elk"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 15))))
        for i in range(40)
    ]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = [tuple(r) for r in textops.inverted_index(sdf, shard_size=8).collect()]
    got = _decode(rows)
    want = {}
    for i, txt in docs:
        for t in set(txt.split()):
            want.setdefault(t, set()).add((i, txt.split().count(t)))
    assert got == want


def test_shard_bound_and_assignment(spark):
    """No row holds more than shard_size postings, and shard ==
    doc_id DIV shard_size for every decoded posting."""
    docs = [(i, "same") for i in range(30)]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = textops.inverted_index(sdf, shard_size=10).collect()
    assert sorted(r.shard for r in rows) == [0, 1, 2]
    for r in rows:
        assert r.n_docs <= 10
        first_doc = int(r.postings.split(",")[0].split(":")[0])
        assert first_doc // 10 == r.shard


def test_plan_two_shuffles(spark):
    """The lag window and the final collect share one (token, shard)
    partitioning — exactly two Exchanges in the whole plan."""
    docs = [(i, "a b a") for i in range(20)]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    plan = (
        textops.inverted_index(sdf, shard_size=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2, plan


def test_duckdb_twin_parity(spark):
    rng = random.Random(77)
    vocab = ["x", "y", "zz", "deep", "blue"]
    docs = [
        (i * 3, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 9))))
        for i in range(25)
    ]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = sorted(
        tuple(r) for r in textops.inverted_index(sdf, shard_size=16).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            textops.inverted_index_sql("documents", shard_size=16)
        ).fetchall()
    )
    assert got == twin

"""Blocking quality metrics (evaluation.blocking_eval) — planted
perfect/lossy blockings, orientation normalization, empty-truth NULL,
and DuckDB twin parity."""

import pytest

import duckdb

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("blocking-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, cand, truth, doc_ids):
    cdf = spark.createDataFrame(cand, "doc_a bigint, doc_b bigint")
    tdf = spark.createDataFrame(truth, "doc_a bigint, doc_b bigint")
    ddf = spark.createDataFrame([(d,) for d in doc_ids], "doc_id bigint")
    r = evaluation.blocking_eval(cdf, tdf, ddf).collect()[0]
    return (r["n_docs"], r["n_cand"], r["n_truth"], r["n_found"],
            r["completeness_ppm"], r["reduction_ppm"])


def test_perfect_blocking(spark):
    docs = list(range(10))           # C(10,2) = 45
    truth = [(1, 2), (3, 4)]
    cand = [(2, 1), (3, 4), (5, 6)]  # finds both, 3 of 45 pairs
    got = _run(spark, cand, truth, docs)
    assert got == (10, 3, 2, 2, 1_000_000, (45 - 3) * 1_000_000 // 45)


def test_lossy_blocking(spark):
    docs = list(range(6))
    truth = [(0, 1), (2, 3), (4, 5)]
    cand = [(0, 1)]
    got = _run(spark, cand, truth, docs)
    assert got[4] == 333_333
    assert got[3] == 1


def test_empty_truth_null(spark):
    got = _run(spark, [(0, 1)], [], list(range(4)))
    assert got[2] == 0 and got[4] is None


def test_duckdb_twin(spark):
    docs = list(range(12))
    truth = [(0, 1), (2, 3), (10, 11)]
    cand = [(1, 0), (2, 3), (5, 7), (8, 9)]
    want = _run(spark, cand, truth, docs)
    con = duckdb.connect()
    con.execute("CREATE TABLE c (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO c VALUES (?, ?)", cand)
    con.execute("CREATE TABLE t (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", truth)
    con.execute("CREATE TABLE d (doc_id BIGINT)")
    con.executemany("INSERT INTO d VALUES (?)", [(x,) for x in docs])
    got = con.execute(
        evaluation.blocking_eval_sql("c", "t", "d")
    ).fetchall()[0]
    assert tuple(got) == want

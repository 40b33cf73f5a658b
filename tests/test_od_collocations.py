"""OD flow matrix (spatial.od_flows) + PMI collocations
(textops.collocations)."""

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial, textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("odcol-tests", master="local[4]",
                    shuffle_partitions=8)


def test_od_flows_counts_and_intra(spark):
    # track 1 hops A→A→B; track 2 hops B→A  (cells at 90° resolution)
    rows = [
        (1, 1, -170.0, -80.0), (1, 2, -160.0, -70.0), (1, 3, 100.0, 50.0),
        (2, 1, 100.0, 50.0), (2, 2, -170.0, -80.0),
    ]
    df = spark.createDataFrame(rows, "trip int, seq int, lon double, lat double")
    out = spatial.od_flows(df, "trip", "seq", res_deg=90.0)
    got = {(r.cell_from, r.cell_to): (r.n_flows, r.intra)
           for r in out.collect()}
    a = 0 * 4 + 0   # (-170,-80) band at 90°: row 0, col 0
    b = 1 * 4 + 3   # (100,50): row 1, col 3
    assert got[(a, a)] == (1, True)
    assert got[(a, b)] == (1, False)
    assert got[(b, a)] == (1, False)
    # conservation: total flows == total segments (n_points - n_tracks)
    assert sum(n for n, _ in got.values()) == 5 - 2


def test_od_flows_duckdb_twin(spark):
    rng = random.Random(2)
    rows = [(t, s, rng.uniform(-180, 180), rng.uniform(-90, 90))
            for t in range(6) for s in range(1, 25)]
    df = spark.createDataFrame(rows, "trip int, seq int, lon double, lat double")
    got = sorted(map(tuple,
                     spatial.od_flows(df, "trip", "seq", 30.0).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(trip INT, seq INT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    want = sorted(map(tuple, con.execute(
        spatial.od_flows_sql("t", "trip", "seq", 30.0)).fetchall()))
    assert got == want


def test_collocations_scores(spark):
    # "new york" always adjacent (PMI high); "the" promiscuous (low):
    # it precedes cat / mat / dog equally often
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat near new york the dog ran to new york")
         for i in range(3)],
        "doc_id int, text string",
    )
    out = {(r.tok_a, r.tok_b): r for r in
           textops.collocations(docs, min_count=3).collect()}
    assert ("new", "york") in out
    assert out[("new", "york")].pair_n == 6
    # c_ab = c_a = c_b = 6, N = 14·3 = 42 bigrams → 6·42·10⁶ DIV 36
    assert out[("new", "york")].score_m == 7_000_000
    # the→cat: c_ab = 3, c_the = 9, c_cat = 3 → 3·42·10⁶ DIV 27
    assert out[("the", "cat")].score_m == 4_666_666
    assert out[("new", "york")].score_m > out[("the", "cat")].score_m
    # min_count guard: nothing below 3
    assert all(r.pair_n >= 3 for r in out.values())


def test_collocations_duckdb_twin(spark):
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(60)))
            for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = sorted(map(tuple, textops.collocations(df, 2).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents2(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents2 VALUES (?, ?)", docs)
    want = sorted(map(tuple, con.execute(
        textops.collocations_sql("documents2", 2)).fetchall()))
    assert got == want


def test_collocations_no_driver_collect_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (
        textops.collocations(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the 1-row total joins broadcast-side; the token stream never does
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

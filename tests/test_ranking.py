"""Pareto skyline and reciprocal-rank fusion (operators/ranking.py) —
planted-semantics hand cases, random inputs vs plain-Python ground
truths and the DuckDB twins, and the loud-guard contracts."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import ranking


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ranking-tests", master="local[4]",
                    shuffle_partitions=8)


# ---------------------------------------------------------------------------
# plain-Python ground truths
# ---------------------------------------------------------------------------

def _skyline_python(rows):
    """rows: [(id, x, y)] → frontier ids (duplicates of frontier
    points all survive)."""
    out = []
    for rid, x, y in rows:
        dominated = any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for _, qx, qy in rows
        )
        if not dominated:
            out.append(rid)
    return sorted(out)


def _rrf_python(runs, rrf_k=60, scale=ranking.RRF_SCALE):
    """runs: [[(id, score)]] → {id: (rrf_score, n_runs)}."""
    fused = {}
    for run in runs:
        ranked = sorted(run, key=lambda t: (-t[1], t[0]))
        for pos, (rid, _) in enumerate(ranked, start=1):
            s, n = fused.get(rid, (0, 0))
            fused[rid] = (s + scale // (rrf_k + pos), n + 1)
    return fused


def _spark_skyline(spark, rows, **kw):
    df = spark.createDataFrame(rows, "rid bigint, x bigint, y bigint")
    got = ranking.skyline(df, "x", "y", **kw).collect()
    return sorted(r["rid"] for r in got)


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------

def test_skyline_hand_case(spark):
    """Staircase + interior points: only the staircase survives; the
    duplicate of a frontier point survives too (neither dominates)."""
    rows = [
        (1, 10, 1), (2, 8, 5), (3, 5, 8), (4, 1, 10),  # frontier
        (5, 7, 4), (6, 2, 2),                           # dominated
        (7, 8, 5),                                      # duplicate of 2
        (8, 8, 4),                                      # same x, lower y
    ]
    assert _spark_skyline(spark, rows) == [1, 2, 3, 4, 7]


def test_skyline_single_and_empty(spark):
    assert _spark_skyline(spark, [(1, 3, 3)]) == [1]
    df = spark.createDataFrame([], "rid bigint, x bigint, y bigint")
    assert ranking.skyline(df, "x", "y").count() == 0


def test_skyline_all_equal(spark):
    """All-identical points: nothing dominates anything."""
    rows = [(i, 4, 7) for i in range(5)]
    assert _spark_skyline(spark, rows) == [0, 1, 2, 3, 4]


def test_skyline_bucket_boundaries(spark):
    """n_buckets=1 (pure window path) and n_buckets ≫ range (pure
    suffix path) agree with the default on random data."""
    rng = random.Random(99)
    rows = [
        (i, rng.randrange(50), rng.randrange(50)) for i in range(300)
    ]
    want = _skyline_python(rows)
    assert _spark_skyline(spark, rows, n_buckets=1) == want
    assert _spark_skyline(spark, rows, n_buckets=1000) == want
    assert _spark_skyline(spark, rows) == want


def test_skyline_negative_coords(spark):
    """Negative coordinates exercise the floor-bucket arithmetic."""
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(-40, 40), rng.randrange(-40, 40))
        for i in range(200)
    ]
    assert _spark_skyline(spark, rows) == _skyline_python(rows)


def test_skyline_vs_duckdb_twin(spark):
    rng = random.Random(321)
    rows = [
        (i, rng.randrange(100), rng.randrange(100)) for i in range(400)
    ]
    got = _spark_skyline(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (rid BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", rows)
    twin = sorted(
        r[0] for r in con.execute(ranking.skyline_sql("pts")).fetchall()
    )
    assert got == twin == _skyline_python(rows)


# ---------------------------------------------------------------------------
# rrf_fusion
# ---------------------------------------------------------------------------

def _spark_rrf(spark, runs, **kw):
    dfs = [
        spark.createDataFrame(run, "doc_id bigint, score bigint")
        for run in runs
    ]
    out = ranking.rrf_fusion(dfs, **kw).collect()
    return {r["doc_id"]: (r["rrf_score"], r["n_runs"]) for r in out}


def test_rrf_hand_case(spark):
    """Item 1 is rank 1 in both runs; item 2 rank 2 in one, absent in
    the other; the votes are the exact floor-div integers."""
    runs = [[(1, 100), (2, 50)], [(1, 9), (3, 7)]]
    got = _spark_rrf(spark, runs)
    v1 = ranking.RRF_SCALE // 61
    v2 = ranking.RRF_SCALE // 62
    assert got == {1: (2 * v1, 2), 2: (v2, 1), 3: (v2, 1)}


def test_rrf_tie_breaks_by_id(spark):
    """Equal scores: the LOWER id takes the better (lower) rank."""
    got = _spark_rrf(spark, [[(5, 10), (2, 10)], [(2, 1), (5, 1)]])
    v1, v2 = ranking.RRF_SCALE // 61, ranking.RRF_SCALE // 62
    assert got[2] == (2 * v1, 2) and got[5] == (2 * v2, 2)


def test_rrf_guards(spark):
    one = spark.createDataFrame([(1, 1)], "doc_id bigint, score bigint")
    with pytest.raises(ValueError, match="≥ 2 runs"):
        ranking.rrf_fusion([one])
    big = spark.range(50).selectExpr("id AS doc_id", "id AS score")
    with pytest.raises(ValueError, match="max_run_size"):
        ranking.rrf_fusion([big, big], max_run_size=10)


def test_rrf_random_vs_python_and_duckdb(spark):
    rng = random.Random(2026)
    runs = [
        list({rng.randrange(40): rng.randrange(1000)
              for _ in range(25)}.items())
        for _ in range(3)
    ]
    want = _rrf_python(runs)
    got = _spark_rrf(spark, runs)
    assert got == want

    con = duckdb.connect()
    names = []
    for i, run in enumerate(runs):
        con.execute(f"CREATE TABLE run{i} (doc_id BIGINT, score BIGINT)")
        con.executemany(f"INSERT INTO run{i} VALUES (?, ?)", run)
        names.append(f"SELECT doc_id, score FROM run{i}")
    twin = {
        r[0]: (r[1], r[2])
        for r in con.execute(ranking.rrf_fusion_sql(names)).fetchall()
    }
    assert twin == want

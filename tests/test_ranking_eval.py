"""Ranked-retrieval metrics (evaluation.ranking_eval) — planted runs
with closed-form MRR/MAP/P@k, a plain-int Python mirror on random
runs, and DuckDB twin parity (evaluation.ranking_eval_sql)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation

M = 1_000_000


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ranking-eval-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, runs, qrels, k):
    rdf = spark.createDataFrame(
        runs, "query_id bigint, doc_id bigint, rank bigint"
    )
    qdf = spark.createDataFrame(qrels, "query_id bigint, doc_id bigint")
    rows = evaluation.ranking_eval(rdf, qdf, k=k).collect()
    return {
        r.query_id: (
            r.n_rel, r.n_ret, r.hits, r.first_rank,
            r.p_at_k_ppm, r.recall_ppm, r.rr_ppm, r.ap_ppm,
        )
        for r in rows
    }


def _python_mirror(runs, qrels, k):
    """The metric definitions in plain ints."""
    rel = set(map(tuple, qrels))
    n_rel = {}
    for q, _ in qrels:
        n_rel[q] = n_rel.get(q, 0) + 1
    by_q = {}
    for q, d, r in runs:
        if r <= k:
            by_q.setdefault(q, []).append((r, d))
    out = {}
    for q, lst in by_q.items():
        lst.sort()
        hits = cum = ap_num = 0
        first = None
        for r, d in lst:
            if (q, d) in rel:
                cum += 1
                hits += 1
                ap_num += (cum * M) // r
                if first is None:
                    first = r
        nr = n_rel.get(q, 0)
        out[q] = (
            nr, len(lst), hits, first,
            (hits * M) // k,
            (hits * M) // nr if nr else None,
            M // first if first else 0,
            ap_num // nr if nr else None,
        )
    return out


def test_perfect_run(spark):
    """Every retrieved doc relevant, all relevant retrieved: every
    ppm metric is exactly 10⁶."""
    runs = [(1, d, r) for r, d in enumerate([7, 3, 9], start=1)]
    qrels = [(1, 7), (1, 3), (1, 9)]
    got = _run(spark, runs, qrels, k=3)
    assert got[1] == (3, 3, 3, 1, M, M, M, M)


def test_single_hit_at_rank_3(spark):
    runs = [(1, d, r) for r, d in enumerate(range(10, 20), start=1)]
    qrels = [(1, 12)]  # retrieved at rank 3
    got = _run(spark, runs, qrels, k=10)
    n_rel, n_ret, hits, first, p, rec, rr, ap = got[1]
    assert (n_rel, n_ret, hits, first) == (1, 10, 1, 3)
    assert p == M // 10
    assert rec == M
    assert rr == M // 3
    assert ap == M // 3


def test_relevant_below_cut_degrades_ap(spark):
    """n_rel=2 with one hit at rank 2 → recall 0.5, AP uses the FULL
    denominator: ((1·10⁶ DIV 2) DIV 2) = 250000."""
    runs = [(1, d, r) for r, d in enumerate([5, 6, 7], start=1)]
    qrels = [(1, 6), (1, 99)]  # 99 never retrieved
    got = _run(spark, runs, qrels, k=3)
    n_rel, _, hits, first, _, rec, rr, ap = got[1]
    assert (n_rel, hits, first) == (2, 1, 2)
    assert rec == M // 2
    assert rr == M // 2
    assert ap == (M // 2) // 2


def test_no_hits_and_no_qrels(spark):
    runs = [(1, 5, 1), (1, 6, 2), (2, 5, 1)]
    qrels = [(1, 42)]  # q1 has a relevant doc it missed; q2 none
    got = _run(spark, runs, qrels, k=2)
    assert got[1] == (1, 2, 0, None, 0, 0, 0, 0)
    assert got[2] == (0, 1, 0, None, 0, None, 0, None)


def test_rank_cut_applied(spark):
    """A hit beyond rank k must not count."""
    runs = [(1, 5, 1), (1, 6, 2), (1, 7, 3)]
    qrels = [(1, 7)]
    got = _run(spark, runs, qrels, k=2)
    assert got[1][2] == 0  # hits
    assert got[1][1] == 2  # n_ret cut at k


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(5)
    runs, qrels = [], []
    for q in range(12):
        docs = rng.sample(range(100), 15)
        runs += [(q, d, r) for r, d in enumerate(docs, start=1)]
        qrels += [(q, d) for d in rng.sample(range(100), 8)]
    got = _run(spark, runs, qrels, k=10)
    want = _python_mirror(runs, qrels, k=10)
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE runs_t(query_id BIGINT, doc_id BIGINT, rank BIGINT)"
    )
    con.executemany("INSERT INTO runs_t VALUES (?, ?, ?)", runs)
    con.execute("CREATE TABLE qrels_t(query_id BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO qrels_t VALUES (?, ?)", qrels)
    rows = con.execute(
        evaluation.ranking_eval_sql("runs_t", "qrels_t", k=10)
    ).fetchall()
    got_sql = {r[0]: tuple(r[1:]) for r in rows}
    assert got == got_sql


def test_k_validated(spark):
    with pytest.raises(ValueError):
        evaluation.ranking_eval_sql("r", "q", k=0)

"""nDCG@k (evaluation.ndcg_eval) — perfect/inverted rankings, the
rank-3-vs-9 position sensitivity MAP can't see identically, R>k
saturation, zero-relevant NULL, random ≡ Python mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation
from openstreetmap_license_change_spark.operators.evaluation import (
    NDCG_DISC_U,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ndcg-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, runs, qrels, k=10):
    rdf = spark.createDataFrame(
        runs, "query_id long, doc_id long, rank long"
    )
    qdf = spark.createDataFrame(qrels, "query_id long, doc_id long")
    out = evaluation.ndcg_eval(rdf, qdf, k=k).collect()
    return {
        r.query_id: (r.n_rel_in_k, r.n_rel_total, r.dcg_u,
                     r.idcg_u, r.ndcg_ppm)
        for r in out
    }


def _mirror(runs, qrels, k=10):
    rel = set(map(tuple, qrels))
    rel_n = {}
    for q, d in qrels:
        rel_n[q] = rel_n.get(q, 0) + 1
    byq = {}
    for q, d, r in runs:
        if r <= k:
            byq.setdefault(q, []).append((r, (q, d) in rel))
    out = {}
    for q, rows in byq.items():
        dcg = sum(NDCG_DISC_U[r - 1] for r, is_rel in rows if is_rel)
        nrel = rel_n.get(q, 0)
        if nrel == 0:
            out[q] = (0, 0, dcg, None, None)
            continue
        idcg = sum(NDCG_DISC_U[:min(nrel, k)])
        out[q] = (
            sum(1 for _, ir in rows if ir), nrel, dcg, idcg,
            (dcg * 1_000_000) // idcg,
        )
    return out


def test_perfect_ranking_is_million(spark):
    runs = [(1, d, d) for d in range(1, 11)]
    qrels = [(1, d) for d in range(1, 4)]
    got = _run(spark, runs, qrels)
    assert got[1][4] == 1_000_000


def test_position_sensitivity_rank3_vs_rank9(spark):
    # one relevant doc each; MAP-at-full-recall would call both 'hit'
    runs = [(1, d, d) for d in range(1, 11)]
    runs += [(2, d + 100, d) for d in range(1, 11)]
    qrels = [(1, 3), (2, 109)]
    got = _run(spark, runs, qrels)
    assert got[1][4] > got[2][4]
    assert got[1][2] == NDCG_DISC_U[2]


def test_saturation_when_more_relevant_than_k(spark):
    # 15 relevant docs, k=10: a full window of hits reaches 10⁶
    runs = [(1, d, d) for d in range(1, 11)]
    qrels = [(1, d) for d in range(1, 16)]
    got = _run(spark, runs, qrels)
    assert got[1] == (
        10, 15, sum(NDCG_DISC_U[:10]), sum(NDCG_DISC_U[:10]),
        1_000_000,
    )


def test_zero_relevant_null(spark):
    runs = [(1, d, d) for d in range(1, 6)]
    got = _run(spark, runs, [(2, 1)])
    assert got[1][3] is None and got[1][4] is None


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(852)
    runs, qrels = [], []
    for q in range(12):
        docs = rng.sample(range(1000), 10)
        runs += [(q, d, i + 1) for i, d in enumerate(docs)]
        qrels += [(q, d) for d in rng.sample(range(1000), 8)]
    got = _run(spark, runs, qrels)
    assert got == _mirror(runs, qrels)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE r(query_id BIGINT, doc_id BIGINT, rank BIGINT)"
    )
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", runs)
    con.execute("CREATE TABLE g(query_id BIGINT, doc_id BIGINT)")
    con.executemany("INSERT INTO g VALUES (?, ?)", qrels)
    rows = con.execute(
        evaluation.ndcg_eval_sql("r", "g", k=10)
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got

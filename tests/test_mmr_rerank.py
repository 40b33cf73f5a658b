"""MMR reranking (similarity.mmr_rerank) — pure-relevance first pick,
diversity displaces a near-duplicate, w_div=0 degenerates to
sort-by-relevance, picked rows leave the state, bounds validation,
random ≡ greedy mirror ≡ unrolled-CTE twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("mmr-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "vec_id long, rel_q long, embedding array<double>"


def _run(spark, rows, k, w_rel=1, w_div=1):
    df = spark.createDataFrame(rows, SCHEMA)
    out = similarity.mmr_rerank(df, k, w_rel=w_rel, w_div=w_div)
    return [(r.pick_rank, r.vec_id, r.rel_q, r.div_q, r.score_q)
            for r in out.collect()]


def _mirror(rows, k, w_rel=1, w_div=1, scale=10**6):
    def q(v):
        s = v * scale
        return int(s + 0.5) if s >= 0 else -int(-s + 0.5)

    pts = {i: ([q(x) for x in vec], rel) for i, rel, vec in rows}
    first = max(pts, key=lambda i: (pts[i][1], -i))
    out = [(0, first, pts[first][1], None, w_rel * pts[first][1])]
    mind = {}
    for i in pts:
        if i == first:
            continue
        mind[i] = sum((a - b) ** 2
                      for a, b in zip(pts[i][0], pts[first][0]))
    for t in range(1, k):
        pick = max(
            mind,
            key=lambda i: (w_rel * pts[i][1] + w_div * mind[i], -i),
        )
        score = w_rel * pts[pick][1] + w_div * mind[pick]
        out.append((t, pick, pts[pick][1], mind[pick], score))
        del mind[pick]
        for i in mind:
            d = sum((a - b) ** 2
                    for a, b in zip(pts[i][0], pts[pick][0]))
            mind[i] = min(mind[i], d)
    return out


def test_first_pick_pure_relevance_tie_by_id(spark):
    rows = [
        (3, 100, [0.0, 0.0]),
        (1, 100, [1.0, 0.0]),   # same rel — smaller id wins
        (2, 50, [0.0, 1.0]),
    ]
    got = _run(spark, rows, k=2)
    assert got[0] == (0, 1, 100, None, 100)


def test_diversity_displaces_near_duplicate(spark):
    # cand 2 is a near-dup of the winner with slightly lower rel;
    # cand 3 is far away with much lower rel.  Pure relevance would
    # rank 2 second; diversity must promote 3.
    rows = [
        (1, 1000, [0.0, 0.0]),
        (2, 999, [0.001, 0.0]),     # dist² = 10⁶ from pick 1
        (3, 100, [1.0, 0.0]),       # dist² = 10¹² from pick 1
    ]
    got = _run(spark, rows, k=2, w_rel=1, w_div=1)
    assert [r[1] for r in got] == [1, 3]
    # and the scores are the exact integers
    assert got[1] == (1, 3, 100, 10**12, 100 + 10**12)
    assert got == _mirror(rows, k=2)


def test_w_div_zero_is_sort_by_relevance(spark):
    rows = [
        (1, 10, [0.0, 0.0]),
        (2, 30, [0.0, 0.0]),   # coincident with 1 — still picked
        (3, 20, [5.0, 5.0]),
    ]
    got = _run(spark, rows, k=3, w_rel=1, w_div=0)
    assert [r[1] for r in got] == [2, 3, 1]
    assert got == _mirror(rows, k=3, w_rel=1, w_div=0)


def test_picked_rows_leave_state(spark):
    # the highest-relevance row must appear exactly once even though
    # its relevance would keep winning if it stayed in the pool.
    rows = [
        (1, 10**9, [0.0, 0.0]),
        (2, 1, [0.25, 0.0]),
        (3, 1, [0.0, 0.25]),
        (4, 1, [0.25, 0.25]),
    ]
    got = _run(spark, rows, k=4, w_rel=1, w_div=1)
    assert sorted(r[1] for r in got) == [1, 2, 3, 4]
    assert got == _mirror(rows, k=4)


def test_validation(spark):
    rows = [(1, 1, [0.0]), (2, 2, [1.0])]
    df = None
    with pytest.raises(ValueError, match="exceeds candidate count"):
        _run(spark, rows, k=3)
    with pytest.raises(ValueError, match="k must be"):
        _run(spark, rows, k=1)
    with pytest.raises(ValueError, match="weights"):
        _run(spark, rows, k=2, w_rel=101)
    with pytest.raises(ValueError, match=">= 1"):
        _run(spark, rows, k=2, w_rel=0, w_div=0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(2026)
    # dyadic components (n/64) make the ×10⁶ snap exact in double,
    # float32, and the mirror — no .5-ulp rounding ambiguity.
    rows = [
        (i, rng.randrange(0, 10**6),
         [rng.randrange(-128, 129) / 64 for _ in range(8)])
        for i in range(40)
    ]
    got = _run(spark, rows, k=7, w_rel=3, w_div=2)
    assert got == _mirror(rows, k=7, w_rel=3, w_div=2)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(vec_id BIGINT, rel_q BIGINT, "
        "embedding DOUBLE[])"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(
        similarity.mmr_rerank_sql("t", k=7, w_rel=3, w_div=2)
    ).fetchall()
    assert sorted(tuple(r) for r in out) == sorted(got)

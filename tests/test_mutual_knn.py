"""Mutual-kNN graph (similarity.mutual_knn) — hub exclusion by
reciprocity, planted mutual pair, bucket isolation, loud bucket
guard, random ≡ int mirror ≡ DuckDB long-form twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("mknn-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "vec_id long, label int, embedding array<float>"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = similarity.mutual_knn(df, **kw).collect()
    return {(r.id_a, r.id_b): (r.d2_q, r.rank_ab, r.rank_ba)
            for r in out}


def _mirror(rows, k=4, scale=10**6):
    import numpy as np

    # the engines see float32-stored components cast back to double
    q = {vid: [round(float(np.float32(v)) * scale) for v in vec]
         for vid, _, vec in rows}
    bk = {vid: lab for vid, lab, _ in rows}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(q[a], q[b]))

    tops = {}
    for a in q:
        cand = sorted(
            ((d2(a, b), b) for b in q if b != a and bk[b] == bk[a])
        )[:k]
        tops[a] = {b: i + 1 for i, (_, b) in enumerate(cand)}
    out = {}
    for a in q:
        for b, r_ab in tops[a].items():
            if a < b and a in tops.get(b, {}):
                out[(a, b)] = (d2(a, b), r_ab, tops[b][a])
    return out


def test_planted_mutual_and_hub(spark):
    # two tight twins (1, 2), a hub (3) equidistant-ish to both, and
    # a far point (4); k=1: 1↔2 are mutual, the hub's pick (1) does
    # not reciprocate
    rows = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [0.1, 0.0]),
        (3, 0, [0.5, 0.5]),
        (4, 0, [5.0, 5.0]),
    ]
    got = _run(spark, rows, k=1)
    assert set(got) == {(1, 2)}
    assert got[(1, 2)][1:] == (1, 1)
    assert got == _mirror(rows, k=1)


def test_bucket_isolation(spark):
    # identical vectors in different buckets never pair
    rows = [(1, 0, [1.0, 1.0]), (2, 1, [1.0, 1.0]),
            (3, 0, [1.1, 1.0]), (4, 1, [1.1, 1.0])]
    got = _run(spark, rows, k=2)
    assert set(got) == {(1, 3), (2, 4)}
    assert got == _mirror(rows, k=2)


def test_bucket_guard(spark):
    rows = [(i, 0, [float(i), 0.0]) for i in range(10)]
    with pytest.raises(Exception, match="max_bucket_rows"):
        _run(spark, rows, k=2, max_bucket_rows=4)


def test_validation(spark):
    df = spark.createDataFrame([(1, 0, [0.0])], SCHEMA)
    with pytest.raises(ValueError, match="k must"):
        similarity.mutual_knn(df, k=0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(77)
    rows = [
        (i, i % 3,
         [rng.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    got = _run(spark, rows, k=3)
    assert got == _mirror(rows, k=3)
    assert len(got) > 10

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e(vec_id BIGINT, label INTEGER, "
        "embedding FLOAT[])"
    )
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
    out = con.execute(similarity.mutual_knn_sql("e", k=3)).fetchall()
    assert {(r[0], r[1]): (r[2], r[3], r[4]) for r in out} == got

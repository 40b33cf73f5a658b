"""KN-model document scoring (textops.kn_score_docs) — matched
bigrams reproduce the model's p_kn_ppm exactly, in-vocab unseen
bigrams get the c=0 backoff mass, OOV accounting, and DuckDB twin
parity on a train/held-out split with a Python mirror."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("knscore-tests", master="local[4]",
                    shuffle_partitions=8)


def _model_py(texts):
    bi = {}
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    c_w1, cont_right, cont_left = {}, {}, {}
    for (a, b), c in bi.items():
        c_w1[a] = c_w1.get(a, 0) + c
        cont_right[a] = cont_right.get(a, 0) + 1
        cont_left[b] = cont_left.get(b, 0) + 1
    return bi, c_w1, cont_right, cont_left, len(bi)


def _score_py(texts, model):
    bi, c_w1, cont_right, cont_left, T = model
    out = {}
    for doc, t in texts:
        ws = [w for w in t.lower().split() if w]
        n = n_scored = s = 0
        mn = None
        for a, b in zip(ws, ws[1:]):
            n += 1
            if a not in c_w1 or b not in cont_left:
                continue
            c = bi.get((a, b), 0)
            p = (
                (max(4 * c - 3, 0) * T + 3 * cont_right[a] * cont_left[b])
                * 1_000_000
                // (4 * c_w1[a] * T)
            )
            n_scored += 1
            s += p
            mn = p if mn is None else min(mn, p)
        if n:
            out[doc] = (n, n_scored, n - n_scored, s, mn)
    return out


def _spark_score(spark, train, test):
    tr = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id bigint, text string"
    )
    te = spark.createDataFrame(test, "doc_id bigint, text string")
    model = textops.kn_bigram_model(tr, min_count=1)
    rows = textops.kn_score_docs(te, model).collect()
    return {
        r["doc_id"]: (r["n_bigrams"], r["n_scored"], r["n_oov"],
                      r["sum_p_ppm"], r["min_p_ppm"])
        for r in rows
    }


def test_matched_bigram_reproduces_model(spark):
    train = ["a b a b a c"]
    tr = spark.createDataFrame(
        [(0, train[0])], "doc_id bigint, text string"
    )
    model = textops.kn_bigram_model(tr, min_count=1)
    mrows = {
        (r["w1"], r["w2"]): r["p_kn_ppm"] for r in model.collect()
    }
    got = _spark_score(spark, train, [(9, "a b")])
    # single bigram (a,b), seen: sum == model's p for (a,b)
    assert got[9] == (1, 1, 0, mrows[("a", "b")], mrows[("a", "b")])


def test_backoff_and_oov(spark):
    train = ["x y", "y z"]
    # "z x": both words in vocab (z has left contexts? z appears as w2
    # only; c_w1[z] missing → unscorable).  "y x": y has c_w1, x has
    # cont_left? x appears only as w1 in training → no cont_left → oov.
    # "x z": x has c_w1=1, z has cont_left=1, unseen bigram → backoff.
    got = _spark_score(spark, train, [(1, "x z"), (2, "z x"), (3, "q q")])
    bi, c_w1, cr, cl, T = _model_py(train)
    p = (0 * T + 3 * cr["x"] * cl["z"]) * 1_000_000 // (4 * c_w1["x"] * T)
    assert got[1] == (1, 1, 0, p, p)
    assert got[2] == (1, 0, 1, 0, None)
    assert got[3] == (1, 0, 1, 0, None)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(88)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "zz"]
    train = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25)))
        for _ in range(30)
    ]
    test = [
        (i, " ".join(
            rng.choice(vocab + ["oovword"])
            for _ in range(rng.randrange(2, 20))
        ))
        for i in range(25)
    ]
    want = _score_py(test, _model_py(train))
    assert _spark_score(spark, train, test) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE train (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO train VALUES (?, ?)", list(enumerate(train))
    )
    con.execute("CREATE TABLE test (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO test VALUES (?, ?)", test)
    sql = textops.kn_score_docs_sql(
        "test", textops.kn_bigram_model_sql("train", min_count=1)
    )
    got = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(sql).fetchall()
    }
    assert got == want

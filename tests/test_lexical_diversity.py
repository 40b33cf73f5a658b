"""Lexical diversity (textops.lexical_diversity) — hand-computed
Gini–Simpson values, degenerate docs, a plain-Python mirror, and
DuckDB twin parity on random corpora."""

import random
from collections import Counter

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("lexdiv-tests", master="local[4]",
                    shuffle_partitions=8)


def _python(texts):
    out = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        if not toks:
            continue
        c = Counter(toks)
        n = len(toks)
        types = len(c)
        ttr = types * 10**6 // n
        if n < 2:
            simpson = None
        else:
            rep = sum(v * (v - 1) for v in c.values())
            simpson = (n * (n - 1) - rep) * 10**6 // (n * (n - 1))
        out[i] = (n, types, ttr, simpson)
    return out


def _spark(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = textops.lexical_diversity(df).collect()
    return {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["ttr_m"],
                      r["simpson_ppm"])
        for r in rows
    }


def test_hand_computed(spark):
    """'a a b b': n=4, types=2, rep=2·(1·2)=4, simpson = (12−4)/12 =
    2/3 → 666666 ppm."""
    got = _spark(spark, ["a a b b"])
    assert got == {0: (4, 2, 500_000, 666_666)}


def test_all_same_token_zero_diversity(spark):
    got = _spark(spark, ["x x x x x"])
    assert got[0] == (5, 1, 200_000, 0)


def test_all_distinct_full_diversity(spark):
    got = _spark(spark, ["a b c d"])
    assert got[0] == (4, 4, 1_000_000, 1_000_000)


def test_single_token_null_simpson(spark):
    got = _spark(spark, ["hello"])
    assert got[0] == (1, 1, 1_000_000, None)


def test_empty_doc_dropped(spark):
    got = _spark(spark, ["", "a b"])
    assert 0 not in got and got[1][0] == 2


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(909)
    texts = []
    for _ in range(50):
        texts.append(" ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "eps"])
            for _ in range(rng.randrange(1, 60))
        ))
    want = _python(texts)
    assert _spark(spark, texts) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)",
                    list(enumerate(texts)))
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            textops.lexical_diversity_sql("d")
        ).fetchall()
    }
    assert got == want

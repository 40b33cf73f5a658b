"""Vocabulary drift (textops.vocab_drift) — new/gone/present status,
rate normalization under unequal corpus sizes, min_df, a Python
mirror, and DuckDB twin parity."""

import random
from collections import Counter

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("drift-tests", master="local[4]",
                    shuffle_partitions=8)


def _df(texts):
    c = Counter()
    for t in texts:
        for tok in set(w for w in t.lower().split() if w):
            c[tok] += 1
    return c


def _python(ta, tb, min_df=2):
    dfa, dfb = _df(ta), _df(tb)
    na, nb = len(ta), len(tb)
    out = {}
    for tok in set(dfa) | set(dfb):
        a, b = dfa.get(tok, 0), dfb.get(tok, 0)
        if a + b < min_df:
            continue
        if a == 0:
            out[tok] = (a, b, None, "new")
        elif b == 0:
            out[tok] = (a, b, None, "gone")
        else:
            out[tok] = (a, b, b * na * 10**6 // (a * nb), "present")
    return out


def _spark(spark, ta, tb, min_df=2):
    da = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ta)], "doc_id long, text string"
    )
    db = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tb)], "doc_id long, text string"
    )
    rows = textops.vocab_drift(da, db, min_df=min_df).collect()
    return {
        r["token"]: (r["df_a"], r["df_b"], r["drift_ppm"], r["status"])
        for r in rows
    }


def test_statuses(spark):
    ta = ["old old shared", "shared old thing"]
    tb = ["brand new shared", "shared thing new"]
    got = _spark(spark, ta, tb, min_df=2)
    assert got["old"] == (2, 0, None, "gone")
    assert got["new"] == (0, 2, None, "new")
    assert got["shared"] == (2, 2, 1_000_000, "present")
    assert got == _python(ta, tb)


def test_rate_normalization(spark):
    """Corpus B is 2× the size; a token appearing in the same SHARE
    of docs has drift 10⁶ even though raw df doubled."""
    ta = ["x pad1", "y pad2"]
    tb = ["x a", "x b", "y c", "z d"]
    got = _spark(spark, ta, tb, min_df=1)
    assert got["x"] == (1, 2, 1_000_000, "present")
    assert got["y"] == (1, 1, 500_000, "present")


def test_min_df_drops_hapax(spark):
    got = _spark(spark, ["solo"], ["other"], min_df=2)
    assert got == {}


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(616)
    vocab = [f"w{i}" for i in range(30)]
    ta = [" ".join(rng.choice(vocab) for _ in range(10))
          for _ in range(25)]
    tb = [" ".join(rng.choice(vocab) for _ in range(10))
          for _ in range(35)]
    want = _python(ta, tb)
    assert _spark(spark, ta, tb) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE a (doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE b (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO a VALUES (?, ?)", list(enumerate(ta)))
    con.executemany("INSERT INTO b VALUES (?, ?)", list(enumerate(tb)))
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            textops.vocab_drift_sql("a", "b")
        ).fetchall()
    }
    assert got == want

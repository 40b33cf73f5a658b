"""Token burstiness (textops.token_burstiness) — Poisson-ish vs
bursty plants, the zeros-included variance, min_df, a Python mirror,
and DuckDB twin parity."""

import random
from collections import Counter, defaultdict

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("burst-tests", master="local[4]",
                    shuffle_partitions=8)


def _python(texts, min_df=2):
    per = defaultdict(Counter)
    for i, t in enumerate(texts):
        for w in t.lower().split():
            if w:
                per[w][i] += 1
    n = len(texts)
    out = {}
    for tok, c in per.items():
        df = len(c)
        if df < min_df:
            continue
        s = sum(c.values())
        q = sum(v * v for v in c.values())
        out[tok] = (df, s, (n * q - s * s) * 10**6 // (n * s))
    return out


def _spark(spark, texts, min_df=2):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = textops.token_burstiness(df, min_df=min_df).collect()
    return {r["token"]: (r["df"], r["total"], r["fano_ppm"])
            for r in rows}


def test_uniform_vs_bursty(spark):
    """'the' appears once in every doc (sub-Poisson, fano < 10⁶);
    'llama' appears 5× in one doc and nowhere else (bursty,
    fano ≫ 10⁶)."""
    texts = ["the llama llama llama llama llama",
             "the x", "the y", "the z"]
    got = _spark(spark, texts, min_df=1)
    assert got == _python(texts, min_df=1)
    assert got["the"][2] < 1_000_000          # evenly spread
    assert got["llama"][2] > 3_000_000        # concentrated


def test_exact_fano_value(spark):
    """counts (2, 0): N=2, S=2, Q=4 → fano = (8−4)·10⁶/(2·2) = 10⁶."""
    texts = ["w w pad", "pad other"]
    got = _spark(spark, texts, min_df=1)
    assert got["w"] == (1, 2, 1_000_000)


def test_min_df(spark):
    texts = ["solo here", "here too"]
    got = _spark(spark, texts, min_df=2)
    assert set(got) == {"here"}


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(111)
    vocab = [f"v{i}" for i in range(20)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
        for _ in range(40)
    ]
    want = _python(texts)
    assert _spark(spark, texts) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)",
                    list(enumerate(texts)))
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            textops.token_burstiness_sql("d")
        ).fetchall()
    }
    assert got == want

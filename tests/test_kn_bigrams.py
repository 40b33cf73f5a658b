"""Kneser–Ney bigram model (textops.kn_bigram_model) — the Francisco
effect (continuation counts beat raw counts), per-context probability
normalization, a plain-Python mirror of the exact ppm closed form,
and DuckDB twin parity."""

import random
from collections import Counter, defaultdict

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("kn-tests", master="local[4]",
                    shuffle_partitions=8)


def _python(texts, min_count=1):
    bi = Counter()
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    c_w1 = Counter()
    cont_r = Counter()
    cont_l = Counter()
    for (a, b), c in bi.items():
        c_w1[a] += c
        cont_r[a] += 1
        cont_l[b] += 1
    T = len(bi)
    out = {}
    for (a, b), c in bi.items():
        if c < min_count:
            continue
        num = max(4 * c - 3, 0) * T + 3 * cont_r[a] * cont_l[b]
        out[(a, b)] = (
            c, c_w1[a], cont_r[a], cont_l[b],
            num * 10**6 // (4 * c_w1[a] * T),
        )
    return out


def _spark(spark, texts, min_count=1):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = textops.kn_bigram_model(df, min_count=min_count).collect()
    return {
        (r["w1"], r["w2"]): (r["c"], r["c_w1"], r["cont_right"],
                             r["cont_left"], r["p_kn_ppm"])
        for r in rows
    }


def test_francisco_effect(spark):
    """'francisco' is frequent but ALWAYS follows 'san'; 'day' is
    equally frequent with many left contexts.  After an unseen-ish
    context ('new'), KN backoff prefers 'day' because its
    continuation count is higher — raw counts alone would tie."""
    texts = [
        "san francisco " * 6,
        "good day", "bad day", "nice day", "long day", "every day",
        "new start day",
    ]
    got = _spark(spark, texts)
    assert got == _python(texts)
    # continuation counts: francisco has 1 left context, day has 6
    assert got[("san", "francisco")][3] == 1
    fr = [k for k in got if k[1] == "day"][0]
    assert got[fr][3] == 6


def test_probabilities_normalize_over_vocabulary(spark):
    """Σ_{w2 ∈ V} p(w2|w1) == 1 up to per-term DIV flooring — the
    interpolated-KN invariant: observed pairs carry the discounted
    term, UNSEEN pairs the backoff-only mass 3·R(w1)·L(w2)/(4·c_w1·T)
    (exactly the operator's formula at c = 0)."""
    texts = ["a b a c a d b c", "c a b a", "d a c a b"]
    got = _spark(spark, texts)
    assert got == _python(texts)
    # reconstruct the per-token stats from the mirror
    bi = Counter()
    for t in texts:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    c_w1, cont_r, cont_l = Counter(), Counter(), Counter()
    for (a, b), c in bi.items():
        c_w1[a] += c
        cont_r[a] += 1
        cont_l[b] += 1
    T = len(bi)
    vocab = sorted(cont_l)  # every possible continuation
    for a in c_w1:
        total = 0
        for b in vocab:
            c = bi.get((a, b), 0)
            num = max(4 * c - 3, 0) * T + 3 * cont_r[a] * cont_l[b]
            total += num * 10**6 // (4 * c_w1[a] * T)
        assert 1_000_000 - len(vocab) <= total <= 1_000_000, (a, total)
        # observed entries agree with the operator output
        for b in vocab:
            if (a, b) in got:
                assert got[(a, b)][0] == bi[(a, b)]


def test_min_count_filter(spark):
    texts = ["x y x y x z"]
    got = _spark(spark, texts, min_count=2)
    assert set(got) == {("x", "y"), ("y", "x")}  # (x,z) is a hapax


def test_no_cross_doc_bigrams(spark):
    texts = ["alpha", "beta"]
    assert _spark(spark, texts) == {}


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(515)
    vocab = ["a", "b", "c", "d", "e", "f"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 40)))
        for _ in range(40)
    ]
    want = _python(texts)
    assert _spark(spark, texts) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)",
                    list(enumerate(texts)))
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in con.execute(
            textops.kn_bigram_model_sql("d")
        ).fetchall()
    }
    assert got == want

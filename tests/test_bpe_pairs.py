"""BPE first-merge pair counts (textops.bpe_pair_counts) — planted
corpora with hand-computed Sennrich counts, a plain-Python mirror,
deterministic top-k tie-breaks, and DuckDB twin parity."""

import random
import re
import string
from collections import Counter

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("bpe-tests", master="local[4]",
                    shuffle_partitions=8)


def _python_bpe(texts, top_k=200, mark_end=True):
    wc = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wc[w] += 1
    pairs = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += c
        if mark_end:
            pairs[(w[-1], "</w>")] += c
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(a, b, n) for (a, b), n in ranked[:top_k]]


def _spark_bpe(spark, texts, top_k=200, mark_end=True):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = textops.bpe_pair_counts(
        df, top_k=top_k, mark_end=mark_end
    ).collect()
    return [(r["sym_a"], r["sym_b"], r["pair_n"]) for r in rows]


def test_planted_counts(spark):
    """'aaab aaab ab' → (a,a) appears 2×2=4, (a,b) 2+1=3,
    (b,</w>) 3; word frequency weights, not distinct words."""
    texts = ["aaab aaab ab"]
    got = dict(((a, b), n) for a, b, n in _spark_bpe(spark, texts))
    assert got[("a", "a")] == 4
    assert got[("a", "b")] == 3
    assert got[("b", "</w>")] == 3
    assert _spark_bpe(spark, texts) == _python_bpe(texts)


def test_first_merge_winner(spark):
    """The top row is the pair a BPE learner merges first."""
    texts = ["the the the thin", "then the"]
    got = _spark_bpe(spark, texts)
    assert got == _python_bpe(texts)
    assert got[0][:2] == ("t", "h") and got[0][2] == 6


def test_length_one_words_contribute_end_pair(spark):
    got = dict(((a, b), n) for a, b, n in _spark_bpe(spark, ["a a b"]))
    assert got == {("a", "</w>"): 2, ("b", "</w>"): 1}


def test_no_end_marker(spark):
    got = _spark_bpe(spark, ["ab a"], mark_end=False)
    assert got == [("a", "b", 1)]


def test_topk_tiebreak_deterministic(spark):
    """Equal counts at the k boundary resolve by (sym_a, sym_b)."""
    texts = ["xy za xy za qq"]
    got = _spark_bpe(spark, texts, top_k=3)
    assert got == _python_bpe(texts, top_k=3)


def test_topk_guard(spark):
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="top_k"):
        textops.bpe_pair_counts(df, top_k=0)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(777)
    texts = []
    for _ in range(40):
        words = [
            "".join(rng.choice("abcdef") for _ in range(rng.randrange(1, 7)))
            for _ in range(rng.randrange(1, 30))
        ]
        texts.append(" ".join(words))
    want = _python_bpe(texts, top_k=50)
    assert _spark_bpe(spark, texts, top_k=50) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", list(enumerate(texts))
    )
    rows = con.execute(
        textops.bpe_pair_counts_sql("docs", top_k=50)
    ).fetchall()
    assert [tuple(r) for r in rows] == want

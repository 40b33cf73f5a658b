"""RAKE keyword extraction (textops.rake_keywords) — hand-computed
classic example, stopword/punctuation phrase breaking, duplicate-word
phrases, tie-break determinism, and DuckDB twin parity against a
Python mirror on random synthetic corpora."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("rake-tests", master="local[4]",
                    shuffle_partitions=8)


STOPS = textops.STOPWORDS["en"]


def _rake_py(text, k=3, stops=STOPS):
    toks = [t for t in text.lower().split()]
    # member mask + islands
    runs, cur = [], []
    for t in toks:
        if t.isalpha() and t.isascii() and t not in stops:
            cur.append(t)
        else:
            if cur:
                runs.append(cur)
            cur = []
    if cur:
        runs.append(cur)
    freq, deg = {}, {}
    for run in runs:
        for w in run:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(run)
    wscore = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    seen = {}
    for run in runs:
        phrase = " ".join(run)
        score = sum(wscore[w] for w in run)
        seen[phrase] = (len(run), score)
    ranked = sorted(
        seen.items(), key=lambda kv: (-kv[1][1], kv[0])
    )[:k]
    return [
        (p, n, s, i + 1) for i, (p, (n, s)) in enumerate(ranked)
    ]


def _spark_rake(spark, docs, k=3):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = textops.rake_keywords(df, k=k).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["phrase"], r["n_words"], r["score_ppm"], r["rk"])
        )
    return {d: sorted(v, key=lambda x: x[3]) for d, v in out.items()}


def test_classic_example(spark):
    # "deep learning" run: deg(deep)=2 freq=1 → 2e6; same learning →
    # phrase = 4e6.  single "systems": 1e6.
    text = "deep learning is the future of systems"
    got = _spark_rake(spark, [(1, text)])[1]
    assert got[0] == ("deep learning", 2, 4_000_000, 1)
    assert ("future", 1, 1_000_000) == got[1][:3] or \
           ("future", 1, 1_000_000) == got[2][:3]
    assert got == [
        (p, n, s, r) for (p, n, s, r) in _rake_py(text)
    ]


def test_punctuation_and_numbers_break_phrases(spark):
    text = "fast cars, green cars 42 red cars"
    # tokens: fast cars, | green cars | 42 | red cars
    # "cars," has punctuation → not a member → phrase break after fast
    got = _spark_rake(spark, [(1, text)])[1]
    want = _rake_py(text)
    assert got == want
    phrases = [p for p, _, _, _ in got]
    assert "green cars" in phrases and "red cars" in phrases


def test_repeated_word_in_phrase_counts_twice(spark):
    text = "very very good"
    got = _spark_rake(spark, [(1, text)])[1]
    # one phrase of 3 words: very freq=2 deg=6 → 3e6 each; good 3e6
    assert got == [("very very good", 3, 9_000_000, 1)]


def test_tiebreak_is_phrase_lexicographic(spark):
    text = "alpha beta and gamma delta"
    got = _spark_rake(spark, [(1, text)], k=2)[1]
    # both phrases score 4e6; 'alpha beta' < 'gamma delta'
    assert got[0][0] == "alpha beta" and got[0][3] == 1
    assert got[1][0] == "gamma delta" and got[1][3] == 2


def test_stopword_only_doc_absent(spark):
    got = _spark_rake(spark, [(1, "the and of to"), (2, "real content")])
    assert 1 not in got and 2 in got


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(555)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    punct = ["x1", "foo,", "99", "-"]
    docs = []
    for d in range(40):
        words = []
        for _ in range(rng.randrange(5, 30)):
            r = rng.random()
            if r < 0.2:
                words.append(rng.choice(STOPS))
            elif r < 0.3:
                words.append(rng.choice(punct))
            else:
                words.append(rng.choice(vocab))
        docs.append((d, " ".join(words)))
    got = _spark_rake(spark, docs)
    want = {
        d: _rake_py(t) for d, t in docs if _rake_py(t)
    }
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    orows = con.execute(textops.rake_keywords_sql("docs")).fetchall()
    oracle = {}
    for d, p, n, s, r in orows:
        oracle.setdefault(d, []).append((p, n, s, r))
    oracle = {d: sorted(v, key=lambda x: x[3]) for d, v in oracle.items()}
    assert oracle == want

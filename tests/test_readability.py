"""Readability scores (textops.readability) — hand-computed planted
texts, vowel-group/syllable heuristics, empty-doc NULL, negative FRE
without division-sign divergence, random ≡ Python mirror ≡ twin."""

import random
import re

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("readability-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, docs):
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    out = textops.readability(df).collect()
    return {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables,
                   r.fre_milli, r.fkg_milli)
        for r in out
    }


def _mirror(docs):
    out = {}
    for d, text in docs.items():
        ws = [t for t in re.split(r"\s+", text.lower()) if t]
        s = max(1, len(re.findall(r"[.!?]+", text)))
        y = sum(
            max(1, len(re.findall(r"[aeiouy]+", w))) for w in ws
        )
        if ws:
            fre = (206835 - (1015 * len(ws)) // s - (84600 * y) // len(ws))
            fkg = ((390 * len(ws)) // s + (11800 * y) // len(ws) - 15590)
        else:
            fre = fkg = None
        out[d] = (len(ws), s, y, fre, fkg)
    return out


def test_hand_computed(spark):
    docs = {1: "the cat sat. it ran!"}
    # W=5 S=2 Y=5 → fre = 206835 - 2537 - 84600 = 119698
    #             → fkg = 975 + 11800 - 15590 = -2815
    got = _run(spark, docs)
    assert got == {1: (5, 2, 5, 119_698, -2_815)}


def test_vowelless_word_min_one_syllable(spark):
    docs = {1: "tsk tsk."}
    got = _run(spark, docs)
    assert got[1][2] == 2  # syllables, not 0


def test_multi_vowel_groups(spark):
    # beautiful → eau|i|u = 3 runs; idea → i|ea = 2
    docs = {1: "beautiful idea"}
    got = _run(spark, docs)
    assert got[1][:3] == (2, 1, 5)


def test_no_terminal_punct_one_sentence(spark):
    docs = {1: "plain text with no stops"}
    assert _run(spark, docs)[1][1] == 1


def test_empty_doc_null_scores(spark):
    docs = {1: "   "}
    got = _run(spark, docs)
    assert got[1] == (0, 1, 0, None, None)


def test_negative_fre_exact(spark):
    """Polysyllabic monster words drive FRE negative — both engines
    must agree without a trunc-vs-floor sign trap."""
    docs = {1: "aluminium aluminium aluminium"}
    got = _run(spark, docs)
    assert got == _mirror(docs)
    assert got[1][3] < 0


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(83)
    vocab = ["the", "cat", "beautiful", "tsk", "aluminium", "ran.",
             "go!", "why?", "a", "rhythm", "queueing", "x"]
    docs = {
        d: " ".join(rng.choice(vocab)
                    for _ in range(rng.randrange(0, 30)))
        for d in range(50)
    }
    got = _run(spark, docs)
    assert got == _mirror(docs)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(docs.items()))
    rows = con.execute(textops.readability_sql("t")).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got

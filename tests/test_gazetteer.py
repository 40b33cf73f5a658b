"""Gazetteer phrase tagging (textops.gazetteer_tag) — maximal-match
suppression semantics, repeated-token phrases, overlapping
occurrences, random ≡ Python brute mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gazetteer-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, docs, phrases):
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    out = textops.gazetteer_tag(df, phrases).collect()
    return {
        (r.doc_id, r.phrase): (r.n_hits, r.first_pos, r.n_tokens)
        for r in out
    }


def _brute(docs, phrases):
    """Per-doc maximal-occurrence mirror, O(n·|gaz|) scan."""
    out = {}
    norm = [" ".join(p.lower().split()) for p in phrases]
    for d, text in docs.items():
        toks = [t for t in text.lower().split() if t]
        occ = []  # (start, length, phrase)
        for p in norm:
            pt = p.split()
            for s in range(len(toks) - len(pt) + 1):
                if toks[s:s + len(pt)] == pt:
                    occ.append((s, len(pt), p))
        kept = [
            (s, n, p) for (s, n, p) in occ
            if not any(
                s2 <= s and s2 + n2 >= s + n and n2 > n
                for (s2, n2, _) in occ
            )
        ]
        for s, n, p in kept:
            h, fp, _ = out.get((d, p), (0, s, n))
            out[(d, p)] = (h + 1, min(fp, s), n)
    return out


def test_maximal_match_suppression(spark):
    """Unigrams strictly inside a longer match are suppressed; the
    longer matches themselves all stand."""
    docs = {1: "a big table part of the hash value"}
    phrases = ["big table", "table part", "hash value", "table", "hash"]
    got = _run(spark, docs, phrases)
    assert got == {
        (1, "big table"): (1, 1, 2),
        (1, "table part"): (1, 2, 2),
        (1, "hash value"): (1, 6, 2),
    }


def test_uncovered_unigram_kept(spark):
    """The same unigram is reported where no longer phrase covers it."""
    docs = {1: "table stands alone but big table is covered"}
    got = _run(spark, docs, ["big table", "table"])
    assert got == {
        (1, "big table"): (1, 4, 2),
        (1, "table"): (1, 0, 1),
    }


def test_overlapping_non_nested_both_kept(spark):
    """'big table' and 'table part' overlap at 'table' without nesting
    — the order-free maximality rule keeps both."""
    docs = {1: "big table part"}
    got = _run(spark, docs, ["big table", "table part"])
    assert got == {
        (1, "big table"): (1, 0, 2),
        (1, "table part"): (1, 1, 2),
    }


def test_repeated_token_phrase_overlapping_hits(spark):
    """Phrase 'a a' in 'a a a': two overlapping occurrences, and the
    COUNT(DISTINCT idx) vote must not be fooled by the repeated
    token."""
    docs = {1: "a a a", 2: "a b a"}
    got = _run(spark, docs, ["a a"])
    assert got == {(1, "a a"): (2, 0, 2)}


def test_multi_hit_count_and_first_pos(spark):
    docs = {1: "x y z x y"}
    got = _run(spark, docs, ["x y"])
    assert got == {(1, "x y"): (2, 0, 2)}


def test_case_normalized(spark):
    docs = {1: "Hash VALUE here"}
    got = _run(spark, docs, ["HASH value"])
    assert got == {(1, "hash value"): (1, 0, 2)}


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="empty"):
        textops.gazetteer_tag(df, ["x", "  "])
    with pytest.raises(ValueError, match="duplicate"):
        textops.gazetteer_tag(df, ["Big  Table", "big table"])
    with pytest.raises(ValueError, match="over"):
        textops.gazetteer_tag(df, ["a " * 17])
    with pytest.raises(ValueError, match="invalid"):
        textops.gazetteer_tag_sql("t", ["x", "X"])


def test_random_vs_brute_and_twin(spark):
    rng = random.Random(43)
    vocab = ["big", "table", "part", "hash", "value", "row", "scan",
             "the", "a"]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40)))
        for d in range(40)
    }
    phrases = ["big table", "table part", "hash value", "table",
               "row scan", "the a the", "value", "a a"]
    got = _run(spark, docs, phrases)
    assert got == _brute(docs, phrases)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(docs.items()))
    rows = con.execute(
        textops.gazetteer_tag_sql("t", phrases)
    ).fetchall()
    assert {(r[0], r[1]): tuple(r[2:]) for r in rows} == got
    assert len(got) > 20

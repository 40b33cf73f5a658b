"""Gopher-style composite quality filter (textops.gopher_filter) —
every rule bit exercised by a crafted doc, cross-multiplied boundary
exactness, and DuckDB twin parity on a mixed corpus."""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gopher-tests", master="local[4]", shuffle_partitions=8)


BIT = {name: 1 << i for i, name in enumerate(textops.GOPHER_FLAG_NAMES)}


def _run(spark, docs, **kw):
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    return {
        r.doc_id: r
        for r in textops.gopher_filter(sdf, **kw).collect()
    }


def test_each_rule_fires_alone(spark):
    """One doc per rule, violating exactly that rule (relaxed
    thresholds elsewhere so bits don't overlap)."""
    # 30 words, mean word length 4.8, three stopword types, top_tf 10%
    good = "the amber stone tower with granite basalt marble onyx was " * 3
    docs = [
        (0, good),                                   # clean
        (1, "the and of"),                           # too_short
        (2, ("superlongword " * 30) + "the and"),    # word_len_out (13 avg>10? mean=12.6)
        (3, good + "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"),  # symbol_heavy
        (4, "alpha beta gamma delta " * 8),          # no_stopwords
        (5, "the " + "dominant " * 29 + "and of to in is"),  # top_token
        (6, good + " 11 22 33 44 55 66 77 88 99 00"),  # numeric_heavy
    ]
    got = _run(spark, docs, min_words=10)
    assert got[0].flags == 0 and got[0].keep
    assert got[1].flags & BIT["too_short"]
    assert got[2].flags & BIT["word_len_out"]
    assert got[3].flags & BIT["symbol_heavy"]
    assert got[4].flags & BIT["no_stopwords"]
    assert got[5].flags & BIT["top_token_dominant"]
    assert got[6].flags & BIT["numeric_heavy"]
    assert not any(got[i].keep for i in range(1, 7))


def test_too_long_and_boundaries(spark):
    """max_words is inclusive; exactly-at-bound docs keep."""
    docs = [
        (0, "the and " + "word " * 8),   # exactly 10 words
        (1, "the and " + "word " * 9),   # 11 words
    ]
    got = _run(spark, docs, min_words=2, max_words=10,
               max_top_token_pct=90, min_stop_hits=1)
    assert not (got[0].flags & BIT["too_long"])
    assert got[1].flags & BIT["too_long"]


def test_symbol_pct_cross_mult_boundary(spark):
    """symbol rule is strict-greater: exactly 10% symbols passes."""
    # 9 word chars + 1 symbol char = 10 nonspace chars → 10% exactly
    docs = [(0, "the navam x.")]  # nonspace: thenavamx. = 10 chars, 1 symbol
    got = _run(spark, docs, min_words=1, min_stop_hits=1,
               min_mean_wordlen=1, max_top_token_pct=100)
    assert not (got[0].flags & BIT["symbol_heavy"])


def test_empty_text_flags_short_not_crash(spark):
    got = _run(spark, [(0, "   ")], min_words=1)
    assert got[0].n_words == 0
    assert got[0].flags & BIT["too_short"]
    assert not got[0].keep


def test_duckdb_twin_parity(spark):
    docs = [
        (0, "the and of to in is that for with was " * 4),
        (1, "alpha beta 123 456 789 !!!"),
        (2, "x " * 50),
        (3, "the quick brown fox jumps over the lazy dog and then"),
        (4, ""),
    ]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = sorted(
        tuple(r) for r in textops.gopher_filter(sdf, min_words=5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            textops.gopher_filter_sql("documents", min_words=5)
        ).fetchall()
    )
    assert got == twin


def test_top_tf_run_length_equals_term_frequency(spark):
    """r06 internals: top_tf is computed as the longest equal-run of
    the SORTED token array — interleaved repeats (never adjacent in
    the raw text) must still count as one frequency, and case folds."""
    docs = [
        (0, "dog cat dog bird dog cat Dog the and"),  # dog×4 interleaved
        (1, "a b a b a b a b c the and of"),          # a×4 b×4 tie
    ]
    got = _run(spark, docs, min_words=1, min_stop_hits=1,
               max_top_token_pct=100, min_mean_wordlen=1)
    assert got[0].top_tf == 4      # dog + Dog, never adjacent
    assert got[0].n_words == 9
    assert got[1].top_tf == 4      # tied runs pick the max, not last


def test_null_text_matches_left_join_contract(spark):
    """NULL text: token features 0 (old na.fill path), char features
    NULL → no rule fires except too_short; keep stays False."""
    got = _run(spark, [(0, None)], min_words=1)
    assert got[0].n_words == 0
    assert got[0].top_tf == 0
    assert got[0].stop_hits == 0
    assert got[0].n_numeric == 0
    assert got[0].n_symbols is None
    assert got[0].flags & BIT["too_short"]
    assert not got[0].keep

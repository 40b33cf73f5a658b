"""Shingle-set containment pairs (dedup.containment_pairs) — the
quote-detection planted case Jaccard misses, exact-ppm arithmetic,
the df-cap candidate trade, and DuckDB twin parity on random corpora
(including short-doc gram semantics)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import dedup


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("containment-tests", master="local[4]",
                    shuffle_partitions=8)


def _spark_pairs(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = dedup.containment_pairs(df, **kw).collect()
    return {
        (r["doc_a"], r["doc_b"]): (
            r["n_inter"], r["na"], r["nb"], r["c_ab_ppm"], r["c_ba_ppm"]
        )
        for r in out
    }


def _duck_pairs(con, docs, **kw):
    con.execute("CREATE OR REPLACE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    sql = dedup.containment_pairs_sql("d", **kw)
    return {
        (r[0], r[1]): tuple(r[2:]) for r in con.execute(sql).fetchall()
    }


QUOTE = "the quick brown fox jumps over the lazy dog tonight"
LONG = (
    "completely different opening text here now "
    + QUOTE
    + " and then a very long unrelated tail that keeps going with many "
    "more words about other topics entirely unrelated to the quote "
    "so the union is large and jaccard collapses toward zero"
)


def test_quote_detected_where_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment A→B is
    1.0 (every shingle of A appears in B) while Jaccard is far below
    any dedup threshold — the operator's reason to exist."""
    docs = [(1, QUOTE), (2, LONG)]
    got = _spark_pairs(spark, docs, threshold_ppm=900_000)
    (ni, na, nb, c_ab, c_ba) = got[(1, 2)]
    assert c_ab == 1_000_000 and na == ni  # A ⊆ B exactly
    assert c_ba < 400_000                  # the symmetric ratio is small
    # Jaccard = ni / (na + nb - ni) is below the usual 0.5 bar
    assert ni / (na + nb - ni) < 0.5


def test_disjoint_docs_absent(spark):
    docs = [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")]
    assert _spark_pairs(spark, docs, threshold_ppm=1) == {}


def test_threshold_is_either_direction(spark):
    """The pair emits when EITHER containment clears the bar."""
    docs = [(1, QUOTE), (2, LONG)]
    # c_ab = 1.0, c_ba small: a threshold between them still emits
    got = _spark_pairs(spark, docs, threshold_ppm=500_000)
    assert (1, 2) in got


def test_short_doc_single_gram(spark):
    """Docs shorter than n tokens reduce to their single short gram
    (the gram_array contract) — identical containment on both
    engines."""
    docs = [(1, "hello world"), (2, "hello world"), (3, "hello there")]
    got = _spark_pairs(spark, docs, threshold_ppm=900_000)
    assert got[(1, 2)] == (1, 1, 1, 1_000_000, 1_000_000)
    assert (1, 3) not in got
    con = duckdb.connect()
    assert _duck_pairs(con, docs, threshold_ppm=900_000) == got


def test_df_cap_drops_stop_shingle_pairs(spark):
    """With a biting cap, a pair sharing ONLY the ubiquitous shingle
    is not generated; a pair sharing a rare shingle keeps its EXACT
    containment (computed over full sets, not the capped candidates)."""
    boiler = "all rights reserved copyright notice"
    docs = [
        (i, f"{boiler} unique{i} filler{i} words{i}") for i in range(10)
    ] + [
        (100, "a very special rare sentence appears here " + boiler),
        (101, "a very special rare sentence appears here plus more"),
    ]
    capped = _spark_pairs(
        spark, docs, threshold_ppm=100_000, max_doc_freq=0.3
    )
    assert (0, 1) not in capped          # boilerplate-only pair dropped
    assert (100, 101) in capped          # rare-shingle pair survives
    exact = _spark_pairs(spark, docs, threshold_ppm=100_000)
    assert capped[(100, 101)] == exact[(100, 101)]


def test_random_vs_duckdb_twin(spark):
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randrange(1, 25))))
        for i in range(60)
    ]
    got = _spark_pairs(spark, docs, threshold_ppm=50_000)
    con = duckdb.connect()
    twin = _duck_pairs(con, docs, threshold_ppm=50_000)
    assert got == twin and len(got) > 5

"""End-to-end curation verdict (textops.curation_verdict) — planted
documents firing each reason bit, empty-doc conventions, and exact
composition consistency against the four component operators."""

import random

import pytest

from openstreetmap_license_change_spark.operators import textops
from openstreetmap_license_change_spark.operators.profile import mad_outliers


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("curation-tests", master="local[4]",
                    shuffle_partitions=8)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, n_chars bigint"
    )


def _clean_text(rng, n=60):
    # long enough, stopword-bearing (≥4 guaranteed — gopher needs ≥2
    # DISTINCT stopword hits), varied vocab, no repetition
    words = [f"word{i}" for i in range(400)]
    toks = ["the", "and", "of", "to"] + rng.sample(words, max(n - 4, 1))
    rng.shuffle(toks)
    return " ".join(toks)


def test_planted_bits(spark):
    rng = random.Random(4412)
    rows = []
    # 40 clean docs so medians and corpus dfs are dominated by sanity
    for i in range(40):
        t = _clean_text(rng)
        rows.append((i, t, "en", len(t)))
    # 100: too short -> gopher bit only (few words, but words the
    # corpus shares, normal length handled below by MAD over n_chars)
    rows.append((100, "the and of", "en", 11))
    # 101: repetitive -> "spam spam ..." fires repetition AND gopher's
    # top-token dominance; expected reasons has both bits
    rows.append((101, " ".join(["spam"] * 60), "en", 60 * 5))
    got = {
        r.doc_id: r
        for r in textops.curation_verdict(_df(spark, rows)).collect()
    }
    assert got[100].reasons & 1
    assert got[101].repetitive and (got[101].reasons & 2)
    clean_keep = [got[i].keep for i in range(40)]
    assert sum(clean_keep) >= 35  # the clean bulk passes
    for i in range(40):
        assert not (got[i].reasons & 2)  # no repetition among clean


def test_gibberish_bit(spark):
    rng = random.Random(4413)
    rows = []
    for i in range(30):
        t = _clean_text(rng)
        rows.append((i, t, "en", len(t)))
    # hapax-heavy doc: 40 corpus-unique serials + a few stopwords to
    # dodge the stopword rule — rare_ppm ≈ 40/44 > 0.5
    gib = " ".join(f"zqx{j}token" for j in range(40)) + " the and of to"
    rows.append((200, gib, "en", len(gib)))
    got = {
        r.doc_id: r
        for r in textops.curation_verdict(_df(spark, rows)).collect()
    }
    assert got[200].rare_ppm > 500_000
    assert got[200].reasons & 4
    for i in range(30):
        assert not (got[i].reasons & 4)


def test_length_outlier_bit(spark):
    rng = random.Random(4414)
    rows = []
    for i in range(30):
        t = _clean_text(rng)
        rows.append((i, t, "en", 300 + i % 7))
    big = _clean_text(rng)
    rows.append((300, big, "en", 900_000))  # 3000× the median length
    got = {
        r.doc_id: r
        for r in textops.curation_verdict(_df(spark, rows)).collect()
    }
    assert got[300].len_outlier and (got[300].reasons & 8)
    assert all(not got[i].len_outlier for i in range(30))


def test_empty_doc_convention(spark):
    rng = random.Random(4415)
    rows = [(i, _clean_text(rng), "en", 300) for i in range(10)]
    rows.append((400, "", "en", 0))
    got = {
        r.doc_id: r
        for r in textops.curation_verdict(_df(spark, rows)).collect()
    }
    r = got[400]
    # no token evidence: repetition/gibberish false, rare_ppm NULL;
    # gopher's min_words rule still fires
    assert not r.repetitive and r.rare_ppm is None
    assert not (r.reasons & 2) and not (r.reasons & 4)
    assert r.reasons & 1 and not r.keep


def test_composition_consistency(spark):
    rng = random.Random(4416)
    rows = [(i, _clean_text(rng, n=rng.randrange(5, 80)),
             rng.choice(["en", "de"]), rng.randrange(50, 800))
            for i in range(80)]
    rows.append((500, " ".join(["dup"] * 50), "en", 250))
    df = _df(spark, rows)
    out = {r.doc_id: r
           for r in textops.curation_verdict(df).collect()}
    g = {r.doc_id: r.flags for r in textops.gopher_filter(df).collect()}
    rep = {r.doc_id: r.repetitive
           for r in textops.repetition_stats(df).collect()}
    rt = {r.doc_id: r.rare_ppm
          for r in textops.rare_token_ratio(df).collect()}
    mo = {r.doc_id: r.is_outlier
          for r in mad_outliers(df, "lang", "doc_id", "n_chars").collect()}
    assert set(out) == {r[0] for r in rows}
    for did, r in out.items():
        expected = (
            (1 if g[did] != 0 else 0)
            + (2 if rep.get(did, False) else 0)
            + (4 if (rt.get(did) or 0) > 500_000 else 0)
            + (8 if mo[did] else 0)
        )
        assert r.reasons == expected, did
        assert r.keep == (expected == 0)
        assert r.gopher_flags == g[did]

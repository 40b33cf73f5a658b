"""Gopher-style repetition stats (operators/textops.py
repetition_stats): exact integer shares vs brute force, and the
published drop rule firing on planted boilerplate (the sf corpora are
all below the thresholds, so the flag's true branch is exercised
here)."""

from collections import Counter

import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("repetition-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


DOCS = [
    (1, "buy now buy now buy now buy now buy now"),     # top 2-gram dominates
    (2, "a perfectly ordinary sentence with no repeats at all"),
    (3, "x y x y z w z w q r"),                          # dups but no dominator
    (4, "single"),                                       # shorter than n
]


def _brute(n=2):
    out = {}
    for d, text in DOCS:
        t = text.lower().split()
        grams = ([" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
                 if len(t) > n else [" ".join(t[:n])])
        c = Counter(grams)
        total = sum(c.values())
        top = max(c.values())
        dup = sum(v for v in c.values() if v >= 2)
        ts, ds = top * 1_000_000 // total, dup * 1_000_000 // total
        out[d] = (total, top, dup, ts, ds, ts > 200_000 or ds > 600_000)
    return out


def test_matches_bruteforce_and_flag_fires(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_ngrams, r.top_ngram_count, r.dup_ngram_occurrences,
                   r.top_share_m, r.dup_share_m, r.repetitive)
        for r in textops.repetition_stats(docs, n=2).collect()
    }
    assert got == _brute()
    assert got[1][5] is True      # boilerplate flagged
    assert got[2][5] is False     # clean text kept
    assert got[4][0] == 1         # short doc: one short gram, not dropped

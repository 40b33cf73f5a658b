"""tf-idf top-k terms (operators/textops.py tfidf_topk).

Exact integer scoring (raw inverse-frequency idf) vs brute force, the
total-order tie rule, and the WindowGroupLimit plan shape."""

import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("tfidf-tests", master="local[4]", shuffle_partitions=8)
    yield s


DOCS = [
    (1, "apple apple banana cherry the the the"),
    (2, "banana banana banana the cherry"),
    (3, "cherry durian durian the apple"),
    (4, "the the the the"),
]


def _brute(k):
    from collections import Counter

    tfs = {d: Counter(t.lower().split()) for d, t in DOCS}
    df = Counter()
    for c in tfs.values():
        for tok in c:
            df[tok] += 1
    out = []
    for d, c in tfs.items():
        scored = sorted(
            ((tok, tf, df[tok], tf * 1_000_000 // df[tok]) for tok, tf in c.items()),
            key=lambda r: (-r[3], r[0]),
        )
        for rank, (tok, tf, dfreq, sm) in enumerate(scored[:k], 1):
            out.append((d, tok, tf, dfreq, sm, rank))
    return sorted(out)


@pytest.mark.parametrize("k", [1, 3, 100])
def test_matches_bruteforce(spark, k):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = sorted(
        (r.doc_id, r.token, r.tf, r.df, r.score_m, r.rank)
        for r in textops.tfidf_topk(docs, k=k).collect()
    )
    assert got == _brute(k)


def test_stopword_scores_low_distinct_term_high(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    top1 = {
        r.doc_id: r.token
        for r in textops.tfidf_topk(docs, k=1).collect()
    }
    # 'the' appears in every doc (df=4) and never wins where any
    # distinctive term exists
    assert top1[1] == "apple" and top1[2] == "banana" and top1[3] == "durian"
    assert top1[4] == "the"  # only term in doc 4


def test_plan_uses_window_group_limit(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    plan = (
        textops.tfidf_topk(docs, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan

"""Benchmark decontamination (operators/dedup.py contamination_check).

Claims: exact distinct-n-gram overlap counts vs brute force; clean docs
survive with zeros (left join, never silently dropped); the benchmark
side broadcasts so the exploded corpus never shuffles before the final
per-doc groupBy."""

import pytest

from openstreetmap_license_change_spark.operators import dedup


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("contamination-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


def test_planted_overlap_counts_exact(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "entirely different benchmark question about nothing shared")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains bench-1's full text => shares its 3-grams
            (10, "prefix words the quick brown fox jumps over the lazy dog tonight suffix"),
            # shares one 3-gram with bench 1 ("the quick brown")
            (11, "somewhere the quick brown animal ran away"),
            # clean
            (12, "totally unrelated clean document text here now"),
            # too short for any shared 3-gram run
            (13, "quick brown"),
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: (r.n_hit_ngrams, r.n_bench_docs, r.contaminated)
        for r in dedup.contamination_check(corpus, bench, n=3).collect()
    }
    assert set(rows) == {10, 11, 12, 13}  # clean docs present, not dropped

    def grams(text, n=3):
        t = text.lower().split()
        if len(t) <= n:
            return {" ".join(t[:n])}
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

    b1 = grams("the quick brown fox jumps over the lazy dog tonight")
    assert rows[10] == (len(grams(
        "prefix words the quick brown fox jumps over the lazy dog tonight suffix"
    ) & b1), 1, True)
    assert rows[11] == (1, 1, True)
    assert rows[12] == (0, 0, False)
    assert rows[13] == (0, 0, False)


def test_benchmark_side_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (29, "alpha beta gamma delta")],
        "doc_id bigint, text string",
    )
    out = dedup.contamination_check(
        docs.where("doc_id <> 29"), docs.where("doc_id = 29"), n=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BroadcastExchange" in plan, plan


def test_duplicate_benchmark_ngrams_count_once(spark):
    """A shingle repeated across benchmark docs must not double-count
    n_hit_ngrams (distinct shingles), while n_bench_docs sees both."""
    bench = spark.createDataFrame(
        [(1, "shared phrase number one"), (2, "shared phrase number one")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [(10, "prefix shared phrase number one suffix")],
        "doc_id bigint, text string",
    )
    r = dedup.contamination_check(corpus, bench, n=3).collect()[0]
    assert (r.n_hit_ngrams, r.n_bench_docs, r.contaminated) == (2, 2, True)

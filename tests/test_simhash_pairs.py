"""SimHash Hamming-band near-dup pairs (operators/dedup.py
simhash_near_dup_pairs).

The operator's claim: the (band, band_value) equi-join plus the
bit_count residual returns EXACTLY the Hamming-≤d ball (pigeonhole with
d+1 bands gives perfect recall), each pair exactly once via the
first-matching-band rule — no distinct() — and Catalyst plans a hash
join, never a cross product.  Tests check the band split, brute-force
equivalence on real testdata, exactly-once, the mega-bucket cap with
Observation metrics, and the plan shape."""

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import dedup
from openstreetmap_license_change_spark.sources import pages


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("simhash-pairs-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


def test_band_bounds_cover_all_bits_disjointly():
    for n_bands in (2, 3, 4, 8):
        bounds = dedup.simhash_band_bounds(n_bands)
        assert len(bounds) == n_bands
        covered = []
        for off, w in bounds:
            assert w >= 1
            covered.extend(range(off, off + w))
        assert covered == list(range(dedup.SIMHASH_BITS))


@pytest.mark.parametrize("max_hamming", [0, 3, 7])
def test_pairs_match_bruteforce_on_testdata(spark, max_hamming):
    """Exact Hamming-ball equivalence + exactly-once, against a naive
    all-pairs scan over the same signatures (real sf0.001 documents)."""
    docs = pages.documents(spark, "/root/testdata/sf0.001")
    sigs = {r.doc_id: r.simhash for r in dedup.simhash64(docs).collect()}
    ids = sorted(sigs)
    want = sorted(
        (a, b, (sigs[a] ^ sigs[b]).bit_count())
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (sigs[a] ^ sigs[b]).bit_count() <= max_hamming
    )
    got = [
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_near_dup_pairs(
            docs, max_hamming=max_hamming
        ).collect()
    ]
    assert sorted(got) == want
    assert len(got) == len(set(got))  # exactly once, no distinct() needed


def test_mega_bucket_cap_and_overflow_metrics(spark):
    """Boilerplate duplicated 60× (one simhash → quadratic bucket) must
    emit NO pairs under the cap while small near-dup pairs survive, and
    the same job records the overflow on the Observation."""
    boiler = [(i, "the same boilerplate page text repeated verbatim")
              for i in range(60)]
    pair = [
        (100, "completely different article about spark partitioning"),
        (101, "completely different article about spark partitioning"),
    ]
    singles = [(200 + i, f"unique document number {i} with its own words {i * 7}")
               for i in range(5)]
    docs = spark.createDataFrame(
        boiler + pair + singles, "doc_id bigint, text string"
    )

    uncapped = dedup.simhash_near_dup_pairs(docs).count()
    assert uncapped >= 60 * 59 // 2 + 1

    obs = Observation("simhash_overflow")
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_dup_pairs(
            docs, max_bucket_size=16, observation=obs
        ).collect()
    }
    assert not any(a < 60 and b < 60 for a, b in got), got
    assert (100, 101) in got
    m = obs.get
    assert m["overflow_buckets"] >= 1
    assert m["overflow_docs"] >= 60
    assert m["total_buckets"] > m["overflow_buckets"]


def test_plan_is_equi_join_not_cross_product(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma delta")],
        "doc_id bigint, text string",
    )
    out = dedup.simhash_near_dup_pairs(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan, plan


def test_identical_docs_pair_at_hamming_zero(spark):
    docs = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"),
         (3, "entirely other words elsewhere unrelated")],
        "doc_id bigint, text string",
    )
    rows = dedup.simhash_near_dup_pairs(docs, max_hamming=0).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in rows] == [(1, 2, 0)]


def test_simhash_clusters_matches_pair_transitive_closure(spark):
    """Clusters = transitive closure of the exact pair graph, label =
    min id; isolated docs are singletons; every input doc appears."""
    docs = pages.documents(spark, "/root/testdata/sf0.001")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.simhash_clusters(docs, max_hamming=3).collect()
    }
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert sorted(got) == sorted(ids)

    # brute-force union-find over the (already brute-force-verified)
    # pair list
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in ids}
    assert got == want
    # label is always a member of its own cluster
    assert all(got[lbl] == lbl for lbl in set(got.values()))

"""Deterministic sampling / curation operators: reproducibility under
repartitioning, exact stratum counts, and the dedup-apply contract."""

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import dedup, sampling

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("sampling-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def docs(spark):
    from openstreetmap_license_change_spark.sources import pages

    return pages.documents(spark, SF_DIR)


def test_deterministic_sample_invariant_to_partitioning(spark, docs):
    """The SAME rows are selected regardless of physical layout — the
    property rand()-based sampling cannot give."""
    base = {
        r.doc_id for r in sampling.deterministic_sample(docs, denom=7).collect()
    }
    assert 0 < len(base) < docs.count()
    for layout in (docs.repartition(17), docs.coalesce(1), docs.repartition("lang")):
        got = {
            r.doc_id
            for r in sampling.deterministic_sample(layout, denom=7).collect()
        }
        assert got == base


def test_deterministic_sample_rate_and_validation(spark, docs):
    n = docs.count()
    k = sampling.deterministic_sample(docs, denom=4).count()
    # hash residues are near-uniform; allow generous tolerance
    assert 0.10 <= k / n <= 0.45
    assert sampling.deterministic_sample(docs, denom=1).count() == n
    with pytest.raises(ValueError):
        sampling.deterministic_sample(docs, denom=0)


def test_stratified_sample_exact_counts_and_determinism(spark, docs):
    out = sampling.stratified_sample(docs, "lang", k=4).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    sizes = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, members in by_lang.items():
        assert len(members) == min(4, sizes[lang]), lang
    # deterministic: a reshuffled input selects the identical sets
    out2 = sampling.stratified_sample(docs.repartition(23), "lang", k=4).collect()
    by_lang2 = {}
    for r in out2:
        by_lang2.setdefault(r.lang, set()).add(r.doc_id)
    assert by_lang2 == by_lang


def test_group_topk_matches_bruteforce(spark, docs):
    rows = [(r.doc_id, r.lang, len(r.text)) for r in docs.collect()]
    got = {}
    out = sampling.group_topk(
        docs.withColumn("n_chars", F.length("text")),
        ["lang"],
        [F.desc("n_chars"), F.col("doc_id")],
        k=3,
    ).collect()
    for r in out:
        got.setdefault(r.lang, []).append((r.rank, r.doc_id, r.n_chars))
    langs = {lang for _, lang, _ in rows}
    for lang in langs:
        cands = sorted(
            ((-(n), d) for d, lg, n in rows if lg == lang)
        )[:3]
        want = [(i + 1, d, -neg) for i, (neg, d) in enumerate(cands)]
        assert sorted(got[lang]) == want, lang


def test_minhash_dedup_apply_contract(spark, docs):
    """Survivors are exactly the cluster labels; sizes sum to the
    corpus; every dropped doc's cluster label survives."""
    clusters = dedup.minhash_lsh_clusters(docs)
    survivors = dedup.minhash_dedup_apply(docs, clusters=clusters)
    s_rows = survivors.collect()
    labels = {r.cluster_id for r in clusters.collect()}
    assert {r.doc_id for r in s_rows} == labels
    assert sum(r.cluster_size for r in s_rows) == docs.count()
    # canonical = min id of its cluster
    by_label = {}
    for r in clusters.collect():
        by_label.setdefault(r.cluster_id, []).append(r.doc_id)
    for label, members in by_label.items():
        assert label == min(members)

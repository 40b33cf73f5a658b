"""Webtext curation operators (operators/textops.py passage_dedup,
scrub_pii, domain_rollup): hand-checked semantics + determinism."""

import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("webtext-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _w(lo, hi):
    return " ".join(f"w{i}" for i in range(lo, hi))


def test_passage_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, _w(0, 8)),            # two 4-word passages, both fresh
            (2, _w(0, 8)),            # exact clone -> keeps nothing
            (3, _w(0, 4) + " " + _w(100, 104)),  # first passage dup'd
            (4, _w(200, 206)),        # 6 words -> ragged 2-word tail
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in textops.passage_dedup(docs, window=4).collect()
    }
    assert (out[1].n_passages, out[1].n_kept) == (2, 2)
    assert out[1].text_kept == _w(0, 8)
    assert (out[2].n_passages, out[2].n_kept) == (2, 0)
    assert out[2].text_kept == ""
    assert (out[3].n_passages, out[3].n_kept) == (2, 1)
    assert out[3].text_kept == _w(100, 104)
    assert (out[4].n_passages, out[4].n_kept) == (2, 2)
    assert out[4].text_kept == _w(200, 206)


def test_passage_dedup_within_doc_repeat(spark):
    docs = spark.createDataFrame(
        [(7, _w(0, 4) + " " + _w(0, 4))], "doc_id bigint, text string"
    )
    r = textops.passage_dedup(docs, window=4).collect()[0]
    # the second occurrence inside the SAME doc is dropped too
    assert (r.n_passages, r.n_kept, r.text_kept) == (2, 1, _w(0, 4))


def test_passage_dedup_deterministic_across_parallelism(spark):
    docs = spark.createDataFrame(
        [(i, _w(i % 5, i % 5 + 30)) for i in range(60)],
        "doc_id bigint, text string",
    )
    a = sorted(
        map(tuple, textops.passage_dedup(docs.repartition(1), window=7)
            .collect())
    )
    b = sorted(
        map(tuple, textops.passage_dedup(docs.repartition(11), window=7)
            .collect())
    )
    assert a == b


def test_scrub_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.org or x@y.io thanks"),
            (2, "call 555-0123 or 555 0124 now"),
            (3, "digits 1234-5678990 are not a phone"),
            (4, "clean text"),
            (5, "mixed bob@corp.museum and 555-9999"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in textops.scrub_pii(docs).collect()}
    assert (out[1].n_emails, out[1].n_phones) == (2, 0)
    assert out[1].scrubbed == "mail me at <EMAIL> or <EMAIL> thanks"
    assert (out[2].n_emails, out[2].n_phones) == (0, 2)
    assert out[2].scrubbed == "call <PHONE> or <PHONE> now"
    assert (out[3].n_emails, out[3].n_phones) == (0, 0)
    assert out[4].scrubbed == "clean text"
    assert (out[5].n_emails, out[5].n_phones) == (1, 1)
    assert out[5].scrubbed == "mixed <EMAIL> and <PHONE>"


def test_domain_rollup(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.example.com/p1", False),
            ("https://a.example.com/p1", True),
            ("https://a.example.com/p2", False),
            ("http://b.example.org/x", True),
            ("no-scheme-url", False),
        ],
        "url string, tainted boolean",
    )
    out = {
        r.domain: r
        for r in textops.domain_rollup(pages, taint_col="tainted").collect()
    }
    assert (out["a.example.com"].n_pages, out["a.example.com"].n_urls,
            out["a.example.com"].n_tainted) == (3, 2, 1)
    assert (out["b.example.org"].n_pages, out["b.example.org"].n_urls) == (1, 1)
    assert out[""].n_pages == 1  # malformed urls group under ''

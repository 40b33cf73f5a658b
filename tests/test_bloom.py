"""Bloom membership sketch (sketches.bloom_build/check) — no false
negatives ever, reproducible false positives under load, cell-wise
bit_or mergeability, and DuckDB twin parity."""

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import sketches


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("bloom-tests", master="local[4]", shuffle_partitions=8)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _probes(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "token string")


def test_no_false_negatives(spark):
    texts = [f"tok{i} tok{i + 1}" for i in range(0, 60, 2)]
    docs = _docs(spark, texts)
    sk = sketches.bloom_build(docs, n_bits=256, k=3)
    present = sorted({t for txt in texts for t in txt.split()})
    got = {
        r.token: r.in_bloom
        for r in sketches.bloom_check(
            sk, _probes(spark, present), n_bits=256, k=3
        ).collect()
    }
    assert all(got[t] for t in present)


def test_false_positives_exist_under_load_and_reproduce(spark):
    """64 bits, 40 tokens, k=3: the filter saturates, so absent
    probes false-positive — deterministically, twice."""
    docs = _docs(spark, [" ".join(f"w{i}" for i in range(40))])
    sk = sketches.bloom_build(docs, n_bits=64, k=3)
    absent = [f"zz{i}" for i in range(30)]
    runs = [
        {
            r.token: r.in_bloom
            for r in sketches.bloom_check(
                sk, _probes(spark, absent), n_bits=64, k=3
            ).collect()
        }
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    assert any(runs[0].values()), "saturated filter must false-positive"


def test_mergeable_bit_or(spark):
    """bit_or-merge of two corpus sketches == sketch of the union."""
    a = _docs(spark, ["apple banana", "cherry"])
    b = _docs(spark, ["banana date", "elder fig"])
    both = _docs(spark, ["apple banana", "cherry", "banana date",
                         "elder fig"])
    ska = sketches.bloom_build(a, n_bits=128, k=4)
    skb = sketches.bloom_build(b, n_bits=128, k=4)
    merged = {
        r.word_idx: r.bits
        for r in ska.unionByName(skb)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    }
    direct = {
        r.word_idx: r.bits
        for r in sketches.bloom_build(both, n_bits=128, k=4).collect()
    }
    assert merged == direct


def test_n_bits_validation(spark):
    with pytest.raises(ValueError):
        sketches.bloom_build(_docs(spark, ["x"]), n_bits=100)


def test_duckdb_twin_parity(spark):
    texts = [f"a{i} b{i % 7} common" for i in range(25)]
    docs = _docs(spark, texts)
    probe_list = sorted(
        {t for txt in texts for t in txt.split()}
    ) + [f"no{i}" for i in range(40)]
    sk = sketches.bloom_build(docs, n_bits=128, k=4)
    got = sorted(
        (r.token, r.in_bloom)
        for r in sketches.bloom_check(
            sk, _probes(spark, probe_list), n_bits=128, k=4
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    con.execute("CREATE TABLE probes (token VARCHAR)")
    con.executemany("INSERT INTO probes VALUES (?)",
                    [(t,) for t in probe_list])
    twin = sorted(
        tuple(r)
        for r in con.execute(
            sketches.bloom_ctes("documents", "probes", n_bits=128, k=4)
        ).fetchall()
    )
    assert got == twin

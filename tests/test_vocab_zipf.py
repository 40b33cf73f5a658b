"""Heaps vocabulary-growth curve (textops.vocab_growth) and Zipf
log2-bucket diagnostics (textops.zipf_buckets) — planted prefixes,
empty-prefix NULLs, doubling-ratio semantics, validation, Python
mirror + DuckDB twin parity on random corpora."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("vocabzipf-tests", master="local[4]",
                    shuffle_partitions=8)


def _toks(t):
    return [w for w in t.lower().split() if w]


def _py_growth(rows, cps):
    first = {}
    doc_n = {}
    for did, t in rows:
        ws = _toks(t)
        doc_n[did] = len(ws)
        for w in ws:
            if w not in first or did < first[w]:
                first[w] = did
    out = []
    for c in cps:
        nd = sum(1 for d in doc_n if d < c)
        nt = sum(n for d, n in doc_n.items() if d < c)
        ty = sum(1 for f in first.values() if f < c)
        out.append((c, nd, nt, ty,
                    None if nt == 0 else ty * 1_000_000 // nt))
    return sorted(out)


def _py_zipf(rows, ngram=1):
    freq = {}
    for _, t in rows:
        ws = _toks(t)
        for i in range(len(ws) - ngram + 1):
            g = " ".join(ws[i:i + ngram])
            freq[g] = freq.get(g, 0) + 1
    per = {}
    for c in freq.values():
        b = c.bit_length() - 1
        ty, tk = per.get(b, (0, 0))
        per[b] = (ty + 1, tk + c)
    out = []
    for b, (ty, tk) in per.items():
        prev = per.get(b - 1)
        out.append((b, 1 << b, ty, tk,
                    None if prev is None else ty * 1_000_000 // prev[0]))
    return sorted(out)


def _spark_growth(spark, rows, cps):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = textops.vocab_growth(df, cps).collect()
    return sorted(
        (r.checkpoint, r.n_docs, r.n_tokens, r.n_types,
         r.types_per_mtok)
        for r in got
    )


def _spark_zipf(spark, rows, ngram=1):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = textops.zipf_buckets(df, ngram=ngram).collect()
    return sorted(
        (r.bucket, r.freq_lo, r.n_types, r.n_tokens,
         r.types_ratio_ppm)
        for r in got
    )


def test_growth_planted_prefixes(spark):
    rows = [
        (0, "a b c"),          # 3 tokens, 3 new types
        (1, "a b d d"),        # 4 tokens, 1 new type
        (2, "e"),              # 1 token, 1 new type
        (3, "a a a a"),        # 4 tokens, 0 new types
    ]
    got = _spark_growth(spark, rows, [1, 2, 4])
    assert got == [
        (1, 1, 3, 3, 1_000_000),
        (2, 2, 7, 4, 571_428),
        (4, 4, 12, 5, 416_666),
    ]


def test_growth_empty_prefix_null(spark):
    rows = [(5, "x y")]
    got = _spark_growth(spark, rows, [1, 10])
    assert got == [(1, 0, 0, 0, None), (10, 1, 2, 2, 1_000_000)]


def test_growth_docs_beyond_last_checkpoint_excluded(spark):
    rows = [(0, "a"), (7, "b c")]
    got = _spark_growth(spark, rows, [4])
    assert got == [(4, 1, 1, 1, 1_000_000)]


def test_growth_counts_tokenless_docs(spark):
    rows = [(0, "a b"), (1, "   "), (2, "c")]
    got = _spark_growth(spark, rows, [4])
    assert got == [(4, 3, 3, 3, 1_000_000)]


def test_growth_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        textops.vocab_growth(df, [])
    with pytest.raises(ValueError):
        textops.vocab_growth(df, [3, 2])
    with pytest.raises(ValueError):
        textops.vocab_growth(df, [0, 1])
    with pytest.raises(ValueError):
        textops.vocab_growth(df, list(range(1, 66)))


def test_zipf_planted_buckets(spark):
    # freqs: a=1 (b0), b=2, c=3 (b1), d=5 (b2)
    rows = [(0, "a b b c c c d d d d d")]
    got = _spark_zipf(spark, rows)
    assert got == [
        (0, 1, 1, 1, None),
        (1, 2, 2, 5, 2_000_000),
        (2, 4, 1, 5, 500_000),
    ]


def test_zipf_ratio_null_when_gap(spark):
    # freqs 1 and 4: buckets 0 and 2 — bucket 2 has no bucket-1 peer
    rows = [(0, "a b b b b")]
    got = _spark_zipf(spark, rows)
    assert got == [(0, 1, 1, 1, None), (2, 4, 1, 4, None)]


def test_zipf_bigrams(spark):
    # "a b a b a" → bigrams: "a b"×2, "b a"×2 → bucket 1 only;
    # whitespace noise and a short doc are ignored structurally
    rows = [(0, "a b  a b a"), (1, "x")]
    got = _spark_zipf(spark, rows, ngram=2)
    assert got == [(1, 2, 2, 4, None)]
    assert got == _py_zipf(rows, ngram=2)


def test_zipf_ngram_validated(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        textops.zipf_buckets(df, ngram=0)
    with pytest.raises(ValueError):
        textops.zipf_buckets_sql("docs", ngram=5)


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(40)
    rows = []
    vocab = [f"w{i}" for i in range(60)]
    for did in range(30):
        n = rng.randrange(0, 25)
        # zipf-ish draw: low ids much more likely
        text = " ".join(
            vocab[min(int(rng.expovariate(0.12)), 59)] for _ in range(n)
        )
        rows.append((did, text))
    cps = [1, 2, 4, 8, 16, 32]

    assert _spark_growth(spark, rows, cps) == _py_growth(rows, cps)
    assert _spark_zipf(spark, rows) == _py_zipf(rows)

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    g = con.execute(
        textops.vocab_growth_sql("docs", cps)
    ).fetchall()
    assert sorted(tuple(r) for r in g) == _py_growth(rows, cps)
    for n in (1, 2, 3):
        assert _spark_zipf(spark, rows, ngram=n) == _py_zipf(rows, n)
        z = con.execute(
            textops.zipf_buckets_sql("docs", ngram=n)
        ).fetchall()
        assert sorted(tuple(r) for r in z) == _py_zipf(rows, n)

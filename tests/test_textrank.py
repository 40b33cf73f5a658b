"""TextRank keywords (textops.textrank_keywords) — triangle symmetry,
hub centrality, raw-position window + min_len filter semantics, the
total-order top-k cut, random ≡ spliced-pagerank twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("trank-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "doc_id long, text string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = textops.textrank_keywords(df, **kw).collect()
    return [(r.token, r.rank_q) for r in out]


def test_triangle_equal_ranks(spark):
    got = _run(spark, [(1, "alpha beta gamma alpha")], window=2)
    assert [t for t, _ in got] == ["alpha", "beta", "gamma"]
    assert len({q for _, q in got}) == 1   # symmetric graph


def test_hub_outranks_leaves(spark):
    rows = [(i, f"{w} hubb") for i, w in
            enumerate(["wwww", "xxxx", "yyyy", "zzzz"])]
    got = _run(spark, rows, window=1)
    assert got[0][0] == "hubb"
    assert got[0][1] > got[1][1]


def test_window_measured_on_raw_positions(spark):
    # "to" is filtered (len < 4) but still occupies a raw position:
    # at window=2 the chain aaaa–bbbb–cccc forms (aaaa↔bbbb span the
    # filtered slot) and the middle token ranks first with the
    # symmetric ends tied (token order breaks the tie); at window=1
    # aaaa's only in-window neighbor is the filtered "to", so it is
    # isolated/dangling and sinks below the linked pair.
    rows = [(1, "aaaa to bbbb cccc")]
    linked = _run(spark, rows, window=2)
    isolated = _run(spark, rows, window=1)
    assert [t for t, _ in linked] == ["bbbb", "aaaa", "cccc"]
    assert linked[1][1] == linked[2][1]
    assert [t for t, _ in isolated] == ["bbbb", "cccc", "aaaa"]
    assert isolated[0][1] == isolated[1][1] > isolated[2][1]


def test_topk_total_order_cut(spark):
    rows = [(1, "aaaa bbbb cccc dddd eeee")]
    got = _run(spark, rows, window=1, k=3)
    assert len(got) == 3
    # chain graph: the center ranks first, its two symmetric
    # neighbors tie next (token order breaks the tie), ends drop out
    assert [t for t, _ in got] == ["cccc", "bbbb", "dddd"]
    assert got[1][1] == got[2][1]


def test_validation(spark):
    rows = [(1, "aaaa bbbb")]
    with pytest.raises(ValueError, match="window"):
        _run(spark, rows, window=0)
    with pytest.raises(ValueError, match="k must"):
        _run(spark, rows, k=0)


def test_random_vs_twin(spark):
    rng = random.Random(31337)
    vocab = ["data", "spark", "graph", "tile", "query", "to", "of",
             "shuffle", "index", "merge", "scan", "x"]
    rows = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randrange(3, 20))))
        for i in range(25)
    ]
    got = _run(spark, rows, window=2, k=10)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(
        textops.textrank_keywords_sql("t", window=2, k=10)
    ).fetchall()
    assert [tuple(r) for r in out] == got

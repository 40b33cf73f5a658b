"""Exact-integer BM25 retrieval (textops.bm25_topk) — Spark vs a
plain-Python evaluation of the same cleared-rational formulas, DuckDB
twin parity on random corpora, and the global-top-k plan shape
(TakeOrderedAndProject, never a single-partition window)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("bm25-tests", master="local[4]", shuffle_partitions=8)


def _bm25_python(docs, terms, k):
    """The quantized recurrence in plain ints (independent ground
    truth: same k1=6/5, b=3/4 clearing, same DIV points)."""
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in docs}
    tf = {
        i: {t: ts.count(t) for t in set(ts)} for i, ts in toks.items()
    }
    dl = {i: sum(c.values()) for i, c in tf.items() if c}
    n, total = len(dl), sum(dl.values())
    avgdl_m = 1000 * total // n
    df = {
        t: sum(1 for c in tf.values() if t in c) for t in terms
    }
    scores = {}
    for i in dl:
        s = 0
        for t in terms:
            if t in tf[i] and df[t]:
                idf_m = (
                    (2 * n - 2 * df[t] + 1) * textops.BM25_IDF_SCALE
                    // (2 * df[t] + 1)
                )
                s += (idf_m * 44 * tf[i][t] * avgdl_m) // (
                    20 * tf[i][t] * avgdl_m + 6 * avgdl_m + 18000 * dl[i]
                )
        if s:
            scores[i] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def _mk_docs(rng, n, vocab):
    return [
        (
            i,
            " ".join(
                rng.choice(vocab)
                for _ in range(rng.randrange(3, 40))
            ),
        )
        for i in range(n)
    ]


def test_bm25_matches_python_and_duckdb(spark):
    rng = random.Random(77)
    vocab = ["alpha", "beta", "gamma", "delta", "rare", "x"]
    docs = _mk_docs(rng, 60, vocab)
    terms = ["rare", "alpha"]
    want = _bm25_python(docs, terms, k=7)

    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = [
        (r.doc_id, r.score_m)
        for r in textops.bm25_topk(sdf, terms, k=7).collect()
    ]
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    twin = con.execute(
        textops.bm25_topk_sql("documents", terms, k=7)
    ).fetchall()
    assert [tuple(r) for r in twin] == want


def test_bm25_rare_term_outranks_common(spark):
    """A doc holding only the rare term must beat a doc holding only a
    ubiquitous one — the idf spread doing its job."""
    docs = [(0, "rare"), (1, "common"), (2, "common"), (3, "common"),
            (4, "common"), (5, "common filler pad")]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = textops.bm25_topk(sdf, ["rare", "common"], k=6).collect()
    assert got[0].doc_id == 0


def test_bm25_tie_breaks_by_doc_id(spark):
    """Identical docs score identically; the cut is by doc_id asc."""
    docs = [(i, "same words here") for i in range(8)]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = [r.doc_id for r in textops.bm25_topk(sdf, ["same"], k=3).collect()]
    assert got == [0, 1, 2]


def test_bm25_plan_take_ordered(spark):
    """The global top-k must compile to TakeOrderedAndProject —
    per-partition heaps — not a sort or a single-partition window."""
    sdf = spark.createDataFrame(
        [(0, "a b"), (1, "b c")], "doc_id bigint, text string"
    )
    plan = (
        textops.bm25_topk(sdf, ["b"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# concordance (KWIC)
# ---------------------------------------------------------------------------

def test_kwic_positions_and_clamping(spark):
    docs = [(0, "alpha beta TARGET gamma delta eps"),
            (1, "target starts here"),
            (2, "ends with target"),
            (3, "no match at all"),
            (4, "target mid target")]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = sorted(
        (r.doc_id, r.pos, r.context)
        for r in textops.concordance(sdf, "TaRgEt", window=2).collect()
    )
    assert got == [
        (0, 3, "alpha beta target gamma delta"),
        (1, 1, "target starts here"),
        (2, 3, "ends with target"),
        (4, 1, "target mid target"),
        (4, 3, "target mid target"),
    ]


def test_kwic_zero_shuffle_plan(spark):
    sdf = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    plan = (
        textops.concordance(sdf, "b")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_kwic_duckdb_twin(spark):
    import random
    rng = random.Random(44)
    vocab = ["x", "y", "needle", "z", "w"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12))))
        for i in range(40)
    ]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = sorted(
        tuple(r)
        for r in textops.concordance(sdf, "needle", window=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            textops.concordance_sql("documents", "needle", window=2)
        ).fetchall()
    )
    assert got == twin and len(got) > 10

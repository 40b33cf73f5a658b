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


# ---------------------------------------------------------------------------
# fuzzy_key_join (deletion-neighborhood Levenshtein join)
# ---------------------------------------------------------------------------

from openstreetmap_license_change_spark.operators import dedup as _dedup


def _fuzzy_df(spark, items, idc):
    return spark.createDataFrame(
        [(i, k) for i, k in items], f"{idc} string, key string"
    )


def test_fuzzy_join_exhaustive_d1_completeness(spark):
    """Every string within lev ≤ 1 of 'abc' over a 3-letter alphabet
    must be found (substitutions, insertions, deletions, identity) —
    the exactness proof for the deletion-neighborhood blocking."""
    import itertools

    base = "abc"
    alphabet = "abx"
    neighborhood = {base, "ab", "ac", "bc"}
    for i in range(4):
        for c in alphabet:
            neighborhood.add(base[:i] + c + base[i:])          # insert
            if i < 3:
                neighborhood.add(base[:i] + c + base[i + 1:])  # subst
    rights = sorted(neighborhood) + ["zzz", "abcd!", "a"]
    left = _fuzzy_df(spark, [("L", base)], "a_id")
    right = _fuzzy_df(spark, list(zip(rights, rights)), "b_id")
    got = {
        r.right_key
        for r in _dedup.fuzzy_key_join(
            left, right, left_id="a_id", right_id="b_id"
        ).collect()
    }
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    want = {r for r in rights if lev(base, r) <= 1}
    assert got == want


def test_fuzzy_join_duckdb_twin(spark):
    keys = [f"doc://w/{i}" for i in range(40)] + ["doc://w/1x", "doc:/w/2"]
    left = _fuzzy_df(spark, list(zip(keys, keys)), "a_id")
    right = _fuzzy_df(spark, list(zip(keys, keys)), "b_id")
    got = sorted(
        tuple(r)
        for r in _dedup.fuzzy_key_join(
            left, right, left_id="a_id", right_id="b_id"
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l (a_id VARCHAR, key VARCHAR)")
    con.executemany("INSERT INTO l VALUES (?, ?)", list(zip(keys, keys)))
    con.execute("CREATE TABLE r (b_id VARCHAR, key VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?, ?)", list(zip(keys, keys)))
    twin = sorted(
        tuple(r)
        for r in con.execute(
            _dedup.fuzzy_key_join_sql(
                "l", "r", left_id="a_id", right_id="b_id"
            )
        ).fetchall()
    )
    assert got == twin and len(got) > len(keys)  # self pairs + fuzz

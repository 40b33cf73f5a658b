"""Gini-gain token split scoring (textops.gini_gain_tokens) —
perfect-separator gain, everywhere-token zero, clamp-at-zero,
chi²-vs-gini rare-separator disagreement, random ≡ Python mirror ≡
DuckDB twin."""

import random
import re

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gini-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(docs)],
        "doc_id long, text string, lang string",
    )
    out = textops.gini_gain_tokens(df, **kw).collect()
    return [(r.token, r.df_t, r.gain_ppm) for r in out]


def _mirror(docs, k=25, min_df=2):
    n = len(docs)
    sizes = {}
    pres = {}
    for text, lbl in docs:
        sizes[lbl] = sizes.get(lbl, 0) + 1
        for tok in set(t for t in re.split(r"\s+", text.lower()) if t):
            pres.setdefault(tok, {})
            pres[tok][lbl] = pres[tok].get(lbl, 0) + 1
    sc2 = sum(c * c for c in sizes.values())
    out = []
    for tok, pl in pres.items():
        np_ = sum(pl.values())
        if np_ < min_df:
            continue
        sp2 = sum(v * v for v in pl.values())
        scp = sum(sizes[l] * v for l, v in pl.items())
        sa2 = sc2 - 2 * scp + sp2
        base = 1_000_000 - (sc2 * 1_000_000) // (n * n)
        gp = 1_000_000 - (sp2 * 1_000_000) // (np_ * np_)
        ga = (0 if n - np_ == 0
              else (n - np_) * (1_000_000 - (sa2 * 1_000_000)
                                // ((n - np_) * (n - np_))))
        gain = max(0, base - (np_ * gp + ga) // n)
        out.append((tok, np_, gain))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


def test_perfect_separator(spark):
    # 'xx' in every 'a' doc only; 2 labels × 3 docs
    docs = [("xx foo", "a")] * 3 + [("yy foo", "b")] * 3
    got = _run(spark, docs, k=5, min_df=1)
    # base Gini 1/2 → 500000; xx split is pure → gain 500000
    top = got[0]
    assert top[0] in ("xx", "yy") and top[2] == 500_000
    # 'foo' is everywhere → zero gain
    foo = [g for g in got if g[0] == "foo"][0]
    assert foo[2] == 0


def test_rare_perfect_separator_ranks_low(spark):
    """A df-2 perfect token gains little (tiny branch), while a
    broad 80%-pure token gains more — the chi²-vs-gini contrast."""
    docs = []
    docs += [("rare uniq", "a")] * 2
    docs += [("broad", "a")] * 38
    docs += [("broad", "b")] * 8
    docs += [("other", "b")] * 32
    got = dict((t, g) for t, _, g in _run(spark, docs, k=10, min_df=2))
    assert got["broad"] > got["rare"]


def test_matches_mirror_and_twin_random(spark):
    rng = random.Random(77)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the"]
    docs = []
    for _ in range(120):
        lbl = rng.choice("abc")
        bias = {"a": "alpha", "b": "beta", "c": "gamma"}[lbl]
        words = [bias] * rng.randrange(0, 3) + [
            rng.choice(vocab) for _ in range(rng.randrange(1, 8))
        ]
        rng.shuffle(words)
        docs.append((" ".join(words), lbl))
    got = _run(spark, docs, k=20, min_df=2)
    assert got == _mirror(docs, k=20, min_df=2)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany(
        "INSERT INTO d VALUES (?, ?, ?)",
        [(i, t, l) for i, (t, l) in enumerate(docs)],
    )
    rows = con.execute(
        textops.gini_gain_tokens_sql("d", k=20, min_df=2)
    ).fetchall()
    assert [tuple(r) for r in rows] == got


def test_no_single_partition_window(spark):
    docs = [("a b", "a"), ("b c", "b")] * 3
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(docs)],
        "doc_id long, text string, lang string",
    )
    plan = textops.gini_gain_tokens(df, k=5, min_df=1)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan

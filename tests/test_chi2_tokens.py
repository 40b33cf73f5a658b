"""χ² token–slice association (textops.chi2_tokens): hand-computed
2×2 case, planted perfect/zero separators, degenerate-margin
exclusion, min-df floor, Python mirror on random corpora, and DuckDB
twin parity."""

import math
import random
from collections import Counter, defaultdict

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("chi2-tests", master="local[4]",
                    shuffle_partitions=8)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )


def _canon(rows):
    return sorted(tuple("∅" if v is None else v for v in r) for r in rows)


def test_hand_computed_2x2(spark):
    # 4 en docs (2 with "foo"), 4 de docs (0 with "foo"): for (en,foo)
    # n11=2 n10=0 n01=2 n00=4, N=8, df=2, Ns=4
    # chi2 = 8*(2*4-0*2)^2/(2*6*4*4) = 8*64/192 = 8/3 -> 2666666 ppm
    rows = [(i, "foo bar" if i < 2 else "bar baz", "en") for i in range(4)]
    rows += [(10 + i, "bar qux", "de") for i in range(4)]
    got = {
        (r.slice, r.token): r
        for r in textops.chi2_tokens(_df(spark, rows), k=10).collect()
    }
    assert got[("en", "foo")].chi2_ppm == 2_666_666
    assert got[("en", "foo")].n11 == 2 and got[("en", "foo")].df_t == 2
    # "bar" is in every doc -> degenerate margin, excluded
    assert ("en", "bar") not in got and ("de", "bar") not in got
    # perfect separator: qux only+always in de
    # n11=4 n10=0 n01=0 n00=4 -> chi2 = 8*16^2/(4*4*4*4) = 8 exactly
    assert got[("de", "qux")].chi2_ppm == 8_000_000
    assert got[("de", "qux")].rnk == 1


def test_min_df_floor(spark):
    rows = [(0, "rare common", "en"), (1, "common", "en"),
            (2, "common other", "de"), (3, "other", "de")]
    got = textops.chi2_tokens(_df(spark, rows), k=10, min_df=2).collect()
    assert all(r.token != "rare" for r in got)
    got1 = textops.chi2_tokens(_df(spark, rows), k=10, min_df=1).collect()
    assert any(r.token == "rare" for r in got1)


def test_single_slice_corpus_empty(spark):
    rows = [(i, f"tok{i} shared", "en") for i in range(5)]
    assert textops.chi2_tokens(_df(spark, rows), k=5).count() == 0


def _py_chi2(rows, k, min_df):
    docs = [(d, set(t.lower().split()), s) for d, t, s in rows]
    n = len(docs)
    n_s = Counter(s for _, _, s in docs)
    df = Counter()
    n11 = Counter()
    for _, toks, s in docs:
        for t in toks:
            df[t] += 1
            n11[(s, t)] += 1
    scored = defaultdict(list)
    for (s, t), c in n11.items():
        if df[t] < min_df or df[t] >= n or n_s[s] >= n:
            continue
        delta = c * (n - df[t] - n_s[s] + c) - (df[t] - c) * (n_s[s] - c)
        chi2 = (n * 1_000_000 * delta * delta) // (
            df[t] * (n - df[t]) * n_s[s] * (n - n_s[s])
        )
        scored[s].append((-chi2, t, c, df[t]))
    out = {}
    for s, lst in scored.items():
        for i, (neg, t, c, d) in enumerate(sorted(lst)[:k], 1):
            out[(s, t)] = (c, d, -neg, i)
    return out


def test_random_vs_python_mirror(spark):
    rng = random.Random(4434)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(150):
        lang = rng.choice(["en", "de", "fr"])
        toks = rng.sample(vocab, rng.randrange(3, 12))
        if lang == "de":
            toks += ["der"] * (rng.random() < 0.8)
        rows.append((i, " ".join(toks), lang))
    got = {
        (r.slice, r.token): (r.n11, r.df_t, r.chi2_ppm, r.rnk)
        for r in textops.chi2_tokens(_df(spark, rows), k=7).collect()
    }
    assert got == _py_chi2(rows, 7, 2)
    # the planted de-marker dominates its slice
    assert got[("de", "der")][3] == 1


def test_twin_parity_random(spark):
    rng = random.Random(99)
    vocab = [f"t{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randrange(2, 10))),
         rng.choice(["en", "de"]))
        for i in range(120)
    ]
    got = _canon(textops.chi2_tokens(_df(spark, rows), k=9).collect())
    con = duckdb.connect()
    con.register(
        "docs",
        con.from_df(pd.DataFrame(rows, columns=["doc_id", "text", "lang"])),
    )
    twin = _canon(
        con.execute(textops.chi2_tokens_sql("docs", k=9)).fetchall()
    )
    assert got == twin

"""Slice total-variation divergence (textops.slice_divergence),
longest same-token runs (textops.token_runs), and the CUBE grouping
rollup (profile.cube_rollup) — planted semantics, Python mirrors,
NULL/guard edges, DuckDB twin parity on random corpora."""

import random
from fractions import Fraction

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import textops
from openstreetmap_license_change_spark.operators.profile import (
    cube_rollup,
    cube_rollup_sql,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("divruncube-tests", master="local[4]",
                    shuffle_partitions=8)


def _toks(t):
    return [w for w in t.lower().split() if w]


# ---------------------------------------------------------------- mirrors
def _py_divergence(rows, slice_of, text_of):
    from collections import Counter

    per_slice = {}
    ndocs = {}
    for r in rows:
        s = slice_of(r)
        ndocs[s] = ndocs.get(s, 0) + 1
        per_slice.setdefault(s, Counter()).update(_toks(text_of(r)))
    tot = Counter()
    for c in per_slice.values():
        tot.update(c)
    N = sum(tot.values())
    out = []
    for s, cnt in per_slice.items():
        n = sum(cnt.values())
        m = N - n
        if m == 0:
            tv = None
        else:
            num = sum(
                abs(c * m - (tot[t] - c) * n) for t, c in cnt.items()
            )
            num += n * (m - sum(tot[t] - c for t, c in cnt.items()))
            tv = int(Fraction(num * 10**6, 2 * n * m))  # trunc toward 0
        out.append((s, ndocs[s], n, len(cnt), tv))
    return sorted(out)


def _py_runs(rows):
    out = []
    for did, t in rows:
        ws = _toks(t)
        if not ws:
            out.append((did, 0, None, None, None))
            continue
        runs = []
        start = 0
        for i in range(1, len(ws) + 1):
            if i == len(ws) or ws[i] != ws[i - 1]:
                runs.append((i - start, start + 1, ws[start]))
                start = i
        mx = max(r[0] for r in runs)
        tok = min((r[1], r[2]) for r in runs if r[0] == mx)[1]
        out.append((did, len(ws), len(runs), mx, tok))
    return sorted(out)


def _spark_div(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )
    got = textops.slice_divergence(df).collect()
    return sorted(
        (r.slice, r.n_docs, r.n_tokens, r.n_types, r.tv_ppm)
        for r in got
    )


# ---------------------------------------------------------------- planted
def test_divergence_hand_case(spark):
    # en: {a:2, b:1}; de: {a:1, c:2} -> N=6, n=3, m=3 for each
    # en terms: a |2*3-1*3|=3, b |1*3-0|=3 ; absent mass: c 2*3=6
    #   -> num=12, tv = 12e6 // 18 = 666666
    rows = [
        (0, "a a b", "en"),
        (1, "a c c", "de"),
    ]
    got = _spark_div(spark, rows)
    assert got == [
        ("de", 1, 3, 2, 666666),
        ("en", 1, 3, 2, 666666),
    ]
    assert got == _py_divergence(
        rows, lambda r: r[2], lambda r: r[1]
    )


def test_divergence_identical_slices_zero(spark):
    rows = [(i, "x y z", "en" if i % 2 else "de") for i in range(8)]
    for r in _spark_div(spark, rows):
        assert r[4] == 0


def test_divergence_disjoint_slices_max(spark):
    rows = [(0, "a a a", "en"), (1, "b b b", "de")]
    for r in _spark_div(spark, rows):
        assert r[4] == 1_000_000


def test_divergence_single_slice_null(spark):
    rows = [(0, "a b", "en"), (1, "c", "en")]
    got = _spark_div(spark, rows)
    assert got == [("en", 2, 3, 3, None)]


def test_runs_hand_cases(spark):
    rows = [
        (0, "a a a b b a", ),  # runs: a×3, b×2, a×1 -> max 3 at 1
        (1, "x y x y", ),      # all runs len 1, earliest tok x
        (2, "", ),             # empty
        (3, "z z", ),
    ]
    rows = [(i, t[0]) if isinstance(t, tuple) else (i, t)
            for i, t in enumerate([r[1] for r in rows])]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_runs, r.max_run, r.max_run_token)
        for r in textops.token_runs(df).collect()
    )
    assert got == [
        (0, 6, 3, 3, "a"),
        (1, 4, 4, 1, "x"),
        (2, 0, None, None, None),
        (3, 2, 1, 2, "z"),
    ]
    assert got == _py_runs(rows)


def test_runs_tie_earliest_start(spark):
    # two maximal runs of equal length: b b (pos 3) after a a (pos 1)
    rows = [(0, "a a b b")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    r = textops.token_runs(df).collect()[0]
    assert (r.max_run, r.max_run_token) == (2, "a")


def test_cube_planted(spark):
    rows = [
        (0, "en", "s0", 10),
        (1, "en", "s1", 20),
        (2, "de", "s0", 30),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, n_chars bigint"
    )
    got = {
        (r.lang, r.source, r.grp_id): (r.n_rows, r.sum_value)
        for r in cube_rollup(
            df, ["lang", "source"], sum_col="n_chars"
        ).collect()
    }
    assert got[("en", "s0", 0)] == (1, 10)
    assert got[("en", None, 1)] == (2, 30)    # source aggregated = LSB
    assert got[(None, "s0", 2)] == (2, 40)    # lang aggregated = MSB
    assert got[(None, None, 3)] == (3, 60)
    assert len(got) == 3 + 2 + 2 + 1  # 3 present combos, not 4


def test_cube_null_dim_fails_loud(spark):
    rows = [(0, None, "s0", 1)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, n_chars bigint"
    )
    with pytest.raises(Exception, match="cube_rollup"):
        cube_rollup(df, ["lang", "source"]).collect()


def test_cube_dims_validation(spark):
    df = spark.range(1).withColumn("a", pytest.importorskip(
        "pyspark.sql.functions").lit("x"))
    with pytest.raises(ValueError):
        cube_rollup(df, [])
    with pytest.raises(ValueError):
        cube_rollup(df, ["a"] * 7)


# ---------------------------------------------------------------- twins
def _mkcon(rows, cols):
    con = duckdb.connect()
    con.register("t", con.from_df(pd.DataFrame(rows, columns=cols)))
    return con


def test_divergence_twin_random(spark):
    rng = random.Random(4401)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (
            i,
            " ".join(rng.choices(vocab, k=rng.randrange(0, 30))),
            rng.choice(["en", "de", "fr"]),
        )
        for i in range(120)
    ]
    got = _spark_div(spark, rows)
    assert got == _py_divergence(rows, lambda r: r[2], lambda r: r[1])
    con = _mkcon(rows, ["doc_id", "text", "lang"])
    twin = sorted(
        tuple(r)
        for r in con.execute(
            textops.slice_divergence_sql("t")
        ).fetchall()
    )
    assert got == twin


def test_runs_twin_random(spark):
    rng = random.Random(4402)
    rows = [
        (
            i,
            " ".join(
                rng.choices(["a", "b", "c"], k=rng.randrange(0, 25))
            ),
        )
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_runs, r.max_run, r.max_run_token)
        for r in textops.token_runs(df).collect()
    )
    assert got == _py_runs(rows)
    con = _mkcon(rows, ["doc_id", "text"])
    twin = sorted(
        tuple(r)
        for r in con.execute(textops.token_runs_sql("t")).fetchall()
    )
    assert got == twin


def test_cube_twin_random(spark):
    rng = random.Random(4403)
    rows = [
        (
            i,
            rng.choice(["en", "de", "fr"]),
            rng.choice(["s0", "s1"]),
            rng.randrange(0, 500),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, n_chars bigint"
    )
    canon = lambda rs: sorted(  # noqa: E731
        tuple("∅" if v is None else v for v in r) for r in rs
    )
    got = canon(
        cube_rollup(df, ["lang", "source"], sum_col="n_chars").collect()
    )
    con = _mkcon(rows, ["doc_id", "lang", "source", "n_chars"])
    twin = canon(
        con.execute(
            cube_rollup_sql("t", ["lang", "source"], sum_col="n_chars")
        ).fetchall()
    )
    assert got == twin

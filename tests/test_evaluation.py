"""Exact evaluation operators (evaluation.roc_auc / cohen_kappa) —
planted perfect/inverted/chance cases, tie-class halving, degenerate
groups, negative-kappa sign semantics, and DuckDB twin parity against
naive O(n²)/contingency Python mirrors on random data."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("evaluation-tests", master="local[4]",
                    shuffle_partitions=8)


# ---------------------------------------------------------------- AUC

def _auc_py(rows):
    """Naive pair-count AUC per group: P(pos > neg) + P(tie)/2,
    truncated ppm."""
    out = {}
    groups = {}
    for g, s, y in rows:
        groups.setdefault(g, []).append((s, y))
    for g, sy in groups.items():
        pos = [s for s, y in sy if y]
        neg = [s for s, y in sy if not y]
        if not pos or not neg:
            out[g] = (len(pos), len(neg), None)
            continue
        wins = sum(1 for p in pos for q in neg if p > q)
        ties = sum(1 for p in pos for q in neg if p == q)
        out[g] = (
            len(pos),
            len(neg),
            (2 * wins + ties) * 1_000_000 // (2 * len(pos) * len(neg)),
        )
    return out


def _auc_spark(spark, rows):
    df = spark.createDataFrame(
        rows, "grp string, score bigint, label boolean"
    )
    return {
        r["grp"]: (r["n_pos"], r["n_neg"], r["auc_ppm"])
        for r in evaluation.roc_auc(df, "grp", "score", "label").collect()
    }


def test_auc_perfect_and_inverted(spark):
    rows = (
        [("p", 10 + i, True) for i in range(4)]
        + [("p", i, False) for i in range(4)]
        + [("i", i, True) for i in range(4)]
        + [("i", 10 + i, False) for i in range(4)]
    )
    got = _auc_spark(spark, rows)
    assert got["p"] == (4, 4, 1_000_000)
    assert got["i"] == (4, 4, 0)


def test_auc_all_tied_is_half(spark):
    rows = [("t", 7, True)] * 3 + [("t", 7, False)] * 5
    assert _auc_spark(spark, rows)["t"] == (3, 5, 500_000)


def test_auc_degenerate_groups_null(spark):
    rows = [("onlypos", 1, True), ("onlyneg", 1, False)]
    got = _auc_spark(spark, rows)
    assert got["onlypos"] == (1, 0, None)
    assert got["onlyneg"] == (0, 1, None)


def test_auc_tie_class_halving(spark):
    # pos scores {2,3}, neg {1,3}: wins=3 (2>1,3>1,... 2>1, 3>1, 3>3 tie)
    rows = [("g", 2, True), ("g", 3, True), ("g", 1, False),
            ("g", 3, False)]
    got = _auc_spark(spark, rows)
    # pairs: (2,1) win (2,3) loss→? 2<3 loss; (3,1) win (3,3) tie
    # 2U = 2*2 + 1 = 5 → 5e6 // 8 = 625000
    assert got["g"] == (2, 2, 625_000)


def test_auc_random_vs_python_and_duckdb(spark):
    rng = random.Random(99)
    rows = []
    for g, bias in [("a", 3), ("b", 0), ("c", -2)]:
        for _ in range(150):
            y = rng.random() < 0.4
            s = rng.randrange(0, 20) + (bias if y else 0)
            rows.append((g, s, y))
    want = _auc_py(rows)
    assert _auc_spark(spark, rows) == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE scored (grp VARCHAR, score BIGINT, label BOOLEAN)"
    )
    con.executemany("INSERT INTO scored VALUES (?, ?, ?)", rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            evaluation.roc_auc_sql("scored", "grp", "score", "label")
        ).fetchall()
    }
    assert got == want


# -------------------------------------------------------------- kappa

def _kappa_py(rows):
    out = {}
    groups = {}
    for g, a, b in rows:
        groups.setdefault(g, []).append((a, b))
    for g, ab in groups.items():
        n = len(ab)
        agree = sum(1 for a, b in ab if a == b)
        labels = {x for p in ab for x in p}
        sum_rc = sum(
            sum(1 for a, _ in ab if a == k) * sum(1 for _, b in ab if b == k)
            for k in labels
        )
        den = n * n - sum_rc
        num = n * agree - sum_rc
        if den == 0:
            out[g] = (n, agree, None)
        else:
            q = abs(num) * 1_000_000 // den
            out[g] = (n, agree, -q if num < 0 else q)
    return out


def _kappa_spark(spark, rows):
    df = spark.createDataFrame(rows, "grp string, la string, lb string")
    return {
        r["grp"]: (r["n"], r["n_agree"], r["kappa_ppm"])
        for r in evaluation.cohen_kappa(df, "grp", "la", "lb").collect()
    }


def test_kappa_perfect_agreement(spark):
    rows = [("g", x, x) for x in ["k", "d", "k", "k", "d"]]
    assert _kappa_spark(spark, rows)["g"] == (5, 5, 1_000_000)


def test_kappa_constant_annotators_null(spark):
    rows = [("g", "k", "k")] * 4  # pe = 1 → undefined
    assert _kappa_spark(spark, rows)["g"] == (4, 4, None)


def test_kappa_worse_than_chance_negative(spark):
    # perfect disagreement on balanced labels → kappa = -1
    rows = [("g", "k", "d")] * 2 + [("g", "d", "k")] * 2
    assert _kappa_spark(spark, rows)["g"] == (4, 0, -1_000_000)


def test_kappa_textbook_case(spark):
    # classic 2x2: diag 20+15, off 5+10, N=50
    rows = (
        [("g", "y", "y")] * 20 + [("g", "y", "n")] * 5
        + [("g", "n", "y")] * 10 + [("g", "n", "n")] * 15
    )
    # po=0.7, pe=(25*30 + 25*20)/2500=0.5 → kappa=0.4
    assert _kappa_spark(spark, rows)["g"] == (50, 35, 400_000)


def test_kappa_random_vs_python_and_duckdb(spark):
    rng = random.Random(31)
    labels = ["keep", "drop", "flag"]
    rows = []
    for g in ["a", "b", "c"]:
        for _ in range(200):
            a = rng.choice(labels)
            b = a if rng.random() < 0.6 else rng.choice(labels)
            rows.append((g, a, b))
    want = _kappa_py(rows)
    assert _kappa_spark(spark, rows) == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lab (grp VARCHAR, la VARCHAR, lb VARCHAR)"
    )
    con.executemany("INSERT INTO lab VALUES (?, ?, ?)", rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            evaluation.cohen_kappa_sql("lab", "grp", "la", "lb")
        ).fetchall()
    }
    assert got == want

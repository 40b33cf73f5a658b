"""Exact 2×2 chi-square (evaluation.chi2_2x2) — textbook tables,
no-effect nulls, zero-margin degeneracy, significance flag at the
α=0.05 critical value, and DuckDB twin parity on random groups."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("chi2-tests", master="local[4]",
                    shuffle_partitions=8)


CRIT = 3_841_459


def _py(rows):
    groups = {}
    for g, is_b, ok in rows:
        groups.setdefault(g, []).append((is_b, ok))
    out = {}
    for g, items in groups.items():
        a = sum(1 for ib, ok in items if not ib and ok)
        b = sum(1 for ib, ok in items if not ib and not ok)
        c = sum(1 for ib, ok in items if ib and ok)
        d = sum(1 for ib, ok in items if ib and not ok)
        prod = (a + b) * (c + d) * (a + c) * (b + d)
        n = a + b + c + d
        if prod == 0:
            out[g] = (a + b, c + d, a, c, None, None)
        else:
            num = 1_000_000 * n * (a * d - b * c) ** 2
            out[g] = (
                a + b, c + d, a, c, num // prod, num > CRIT * prod
            )
    return out


def _spark(spark, rows):
    df = spark.createDataFrame(
        rows, "grp string, is_b boolean, ok boolean"
    )
    got = evaluation.chi2_2x2(df, "grp", "is_b", "ok").collect()
    return {
        r["grp"]: (r["n_a"], r["n_b"], r["succ_a"], r["succ_b"],
                   r["chi2_ppm"], r["significant"])
        for r in got
    }


def test_textbook_table(spark):
    # a=20 b=30, c=35 d=15: chi2 = 100*(300-1050)^2/(50*50*55*45)
    rows = (
        [("g", False, True)] * 20 + [("g", False, False)] * 30
        + [("g", True, True)] * 35 + [("g", True, False)] * 15
    )
    got = _spark(spark, rows)["g"]
    num = 1_000_000 * 100 * (20 * 15 - 30 * 35) ** 2
    prod = 50 * 50 * 55 * 45
    assert got == (50, 50, 20, 35, num // prod, True)
    assert got[4] // 1_000_000 == 9  # chi2 ≈ 9.09 — clearly significant


def test_identical_rates_zero(spark):
    rows = (
        [("g", False, True)] * 10 + [("g", False, False)] * 10
        + [("g", True, True)] * 10 + [("g", True, False)] * 10
    )
    got = _spark(spark, rows)["g"]
    assert got[4] == 0 and got[5] is False


def test_zero_margin_null(spark):
    rows = [("onlya", False, True)] * 5
    got = _spark(spark, rows)["onlya"]
    assert got == (5, 0, 5, 0, None, None)
    rows = [("allok", False, True)] * 5 + [("allok", True, True)] * 5
    got = _spark(spark, rows)["allok"]
    assert got[4] is None


def test_small_imbalance_not_significant(spark):
    rows = (
        [("g", False, True)] * 11 + [("g", False, False)] * 9
        + [("g", True, True)] * 9 + [("g", True, False)] * 11
    )
    got = _spark(spark, rows)["g"]
    assert got[5] is False


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(202)
    rows = []
    for g in ["a", "b", "c", "d", "e"]:
        lift = rng.random() * 0.4
        for _ in range(rng.randrange(20, 300)):
            is_b = rng.random() < 0.5
            p = 0.3 + (lift if is_b else 0)
            rows.append((g, is_b, rng.random() < p))
    want = _py(rows)
    assert _spark(spark, rows) == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (grp VARCHAR, is_b BOOLEAN, ok BOOLEAN)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            evaluation.chi2_2x2_sql("t", "grp", "is_b", "ok")
        ).fetchall()
    }
    assert got == want

"""Mann–Whitney rank-sum one-vs-rest (evaluation.rank_sum_test) —
planted location shifts, midrank-tie exactness, degenerate-corpus
NULL guards, Python midrank mirror + DuckDB twin parity, and the
no-unpartitioned-window plan assertion."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ranksum-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = evaluation.rank_sum_test(df, "g", "v", **kw).collect()
    return {
        r.g: (r.n_in, r.n_rest, r.u2, r.auc_ppm, r.z2_ppm)
        for r in out
    }


def _python_mirror(rows):
    """Doubled-U via midranks (independent formulation: R1-based,
    2U = 2·R1 − n1(n1+1)), then the operator's exact staging."""
    from collections import Counter

    pooled = sorted(v for _, v in rows)
    n_all = len(pooled)
    tot = Counter(pooled)
    # doubled midrank of value v: 2·(rank of first) + (t−1)
    first = {}
    pos = 1
    for v in sorted(tot):
        first[v] = pos
        pos += tot[v]
    mid2 = {v: 2 * first[v] + (tot[v] - 1) for v in tot}
    tie_cubes = sum(t ** 3 - t for t in tot.values())
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    out = {}
    for g, vs in groups.items():
        n_in = len(vs)
        n_rest = n_all - n_in
        r2 = sum(mid2[v] for v in vs)
        u2 = r2 - n_in * (n_in + 1)
        if n_rest == 0:
            out[g] = (n_in, 0, u2, None, None)
            continue
        auc = (u2 * 10**6) // (2 * n_in * n_rest)
        t_term = (n_all + 1) * n_all * (n_all - 1) - tie_cubes
        tt = t_term // (n_all * max(n_all - 1, 1))
        if tt <= 0:
            out[g] = (n_in, n_rest, u2, auc, None)
            continue
        r = u2 - n_in * n_rest
        q2 = (r * r) // (n_in * n_rest)
        z2 = (3 * q2 * 10**6) // (4 * tt)
        out[g] = (n_in, n_rest, u2, auc, z2)
    return out


def test_clear_location_shift(spark):
    """Group 'hi' sits entirely above 'lo': U is maximal, auc = 1.0,
    z² large; symmetric for 'lo'."""
    rows = [("lo", v) for v in range(10)] + [
        ("hi", v) for v in range(100, 110)
    ]
    got = _run(spark, rows)
    n, m = 10, 10
    assert got["hi"][2] == 2 * n * m          # doubled max U
    assert got["hi"][3] == 1_000_000
    assert got["lo"][2] == 0
    assert got["lo"][3] == 0
    assert got["hi"][4] == got["lo"][4] > 0   # symmetric z²
    assert got == _python_mirror(rows)


def test_identical_distributions_center(spark):
    """Both groups interleave the same values: auc = ½, z² = 0."""
    rows = [(g, v) for g in ("a", "b") for v in range(8)]
    got = _run(spark, rows)
    assert got["a"] == got["b"]
    assert got["a"][3] == 500_000
    assert got["a"][4] == 0
    assert got == _python_mirror(rows)


def test_midrank_ties_exact(spark):
    """Heavy ties across groups: the doubled-U midrank handling and
    the tie-corrected variance must both match the independent
    R1-based mirror (and hence Fraction-exact staging)."""
    rng = random.Random(31)
    rows = [
        (rng.choice("abc"), rng.randrange(0, 5)) for _ in range(60)
    ]
    got = _run(spark, rows)
    assert got == _python_mirror(rows)
    # Fraction cross-check of auc for one group (pre-truncation):
    a_vals = [v for g, v in rows if g == "a"]
    rest = [v for g, v in rows if g != "a"]
    wins = sum(
        1 for x in a_vals for y in rest if x > y
    ) + Fraction(1, 2) * sum(
        1 for x in a_vals for y in rest if x == y
    )
    auc_exact = Fraction(wins, len(a_vals) * len(rest))
    assert got["a"][3] == (auc_exact.numerator * 10**6) // (
        auc_exact.denominator
    )


def test_single_group_nulls(spark):
    got = _run(spark, [("only", v) for v in range(5)])
    assert got["only"] == (5, 0, 0, None, None)


def test_all_values_tied_null_z2(spark):
    """Every pooled value identical: Var = 0 → z² NULL in BOTH
    engines (the twin would raise on //0 without its guard)."""
    rows = [("a", 7)] * 4 + [("b", 7)] * 6
    got = _run(spark, rows)
    assert got["a"] == (4, 6, 2 * 4 * 6 // 2, 500_000, None)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql_rows = con.execute(
        evaluation.rank_sum_test_sql("t", "g", "v")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in sql_rows} == got


def test_random_matches_mirror_and_duckdb(spark):
    rng = random.Random(37)
    rows = []
    for g, (mu, n) in {
        "en": (50, 40), "de": (55, 25), "fr": (50, 20), "xx": (80, 3),
    }.items():
        rows += [
            (g, mu + rng.randrange(-10, 11)) for _ in range(n)
        ]
    got = _run(spark, rows)
    assert got == _python_mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql_rows = con.execute(
        evaluation.rank_sum_test_sql("t", "g", "v")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in sql_rows} == got
    assert got["xx"][4] > got["fr"][4] >= 0  # planted shift ranks


def test_no_unpartitioned_window(spark):
    """The pooled cumulative must ride the two-level prefix, never a
    global window — the round-1 dense_rank scale lesson, asserted on
    the executed plan."""
    df = spark.createDataFrame(
        [("a", v) for v in range(50)] + [("b", v) for v in range(50)],
        "g string, v bigint",
    )
    out = evaluation.rank_sum_test(df, "g", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(" in plan
    for line in plan.split("\n"):
        if "windowspecdefinition(" in line:
            assert (
                "windowspecdefinition(_rb#" in line
                or "windowspecdefinition(g#" in line
            ), f"unpartitioned window: {line}"


def test_params_validated(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v bigint")
    with pytest.raises(ValueError, match="n_buckets"):
        evaluation.rank_sum_test(df, "g", "v", n_buckets=1)

"""McNemar paired comparison (evaluation.mcnemar_paired) — cell
accounting, clamped continuity correction, no-discordance NULL,
Fraction mirror + twin parity."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("mcnemar-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "g string, a boolean, b boolean"
    )
    out = evaluation.mcnemar_paired(df, "g", "a", "b").collect()
    return {
        r.g: (r.n, r.n_both, r.n_neither, r.n_a_only, r.n_b_only,
              r.chi2_ppm)
        for r in out
    }


def _mirror(rows):
    cells = {}
    for g, a, b in rows:
        c = cells.setdefault(g, [0, 0, 0, 0])
        c[0 if (a and b) else 1 if (not a and not b)
          else 2 if a else 3] += 1
    out = {}
    for g, (both, neither, ao, bo) in cells.items():
        n = both + neither + ao + bo
        if ao + bo == 0:
            chi = None
        else:
            num = max(abs(ao - bo) - 1, 0) ** 2
            chi = (num * 10**6) // (ao + bo)
        out[g] = (n, both, neither, ao, bo, chi)
    return out


def test_textbook_cells(spark):
    rows = (
        [("x", True, True)] * 10
        + [("x", False, False)] * 5
        + [("x", True, False)] * 9
        + [("x", False, True)] * 2
    )
    got = _run(spark, rows)
    # (|9-2|-1)^2/11 = 36/11
    want_chi = (36 * 10**6) // 11
    assert got["x"] == (26, 10, 5, 9, 2, want_chi)
    assert Fraction(36, 11) > 3  # sanity: significant-ish at 0.05


def test_equal_discordance_is_zero(spark):
    """b == c: the clamped correction yields exactly 0, not the
    spurious 1/(b+c) the raw Edwards form would produce."""
    rows = [("x", True, False)] * 4 + [("x", False, True)] * 4
    got = _run(spark, rows)
    assert got["x"][5] == 0


def test_off_by_one_clamps(spark):
    rows = [("x", True, False)] * 3 + [("x", False, True)] * 2
    got = _run(spark, rows)
    assert got["x"][5] == 0  # (|1|-1)^2 = 0


def test_no_discordance_null(spark):
    rows = [("x", True, True)] * 3 + [("x", False, False)] * 2
    got = _run(spark, rows)
    assert got["x"] == (5, 3, 2, 0, 0, None)


def test_random_matches_mirror_and_duckdb(spark):
    rng = random.Random(59)
    rows = [
        (rng.choice("pq"), rng.random() < 0.6, rng.random() < 0.4)
        for _ in range(300)
    ]
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, a BOOLEAN, b BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql_rows = con.execute(
        evaluation.mcnemar_paired_sql("t", "g", "a", "b")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in sql_rows} == got

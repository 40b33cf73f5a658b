"""Robust MAD outlier flags (profile.mad_outliers) — hand-computed
medians (odd/even lower-median convention), MAD=0 degeneracy, planted
heavy-tail robustness vs the mean, and DuckDB twin parity on random
groups."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import profile


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("mad-tests", master="local[4]",
                    shuffle_partitions=8)


def _py(rows, threshold_ppm=3_500_000):
    groups = {}
    for g, i, x in rows:
        groups.setdefault(g, []).append((i, x))
    out = {}
    for g, items in groups.items():
        xs = sorted(x for _, x in items)
        n = len(xs)
        med = xs[(n + 1) // 2 - 1]
        devs = sorted(abs(x - med) for _, x in items)
        mad = devs[(n + 1) // 2 - 1]
        for i, x in items:
            flag = abs(x - med) * 1_000_000 > threshold_ppm * mad
            out[(g, i)] = (x, med, mad, flag)
    return out


def _spark(spark, rows, threshold_ppm=3_500_000):
    df = spark.createDataFrame(rows, "grp string, rid bigint, x bigint")
    got = profile.mad_outliers(
        df, "grp", "rid", "x", threshold_ppm=threshold_ppm
    ).collect()
    return {
        (r["grp"], r["rid"]): (r["x"], r["med"], r["mad"],
                               r["is_outlier"])
        for r in got
    }


def test_odd_group_exact_median(spark):
    rows = [("g", 1, 10), ("g", 2, 20), ("g", 3, 1000)]
    got = _spark(spark, rows)
    # med = 20, devs sorted [10, 980, 10] → [10,10,980], mad = 10
    assert got[("g", 3)] == (1000, 20, 10, True)
    assert got[("g", 1)] == (10, 20, 10, False)


def test_even_group_lower_median(spark):
    rows = [("g", i, v) for i, v in enumerate([1, 2, 3, 4])]
    got = _spark(spark, rows)
    # lower median rank (4+1)//2 = 2 → value 2
    assert got[("g", 0)][1] == 2


def test_mad_zero_flags_any_deviation(spark):
    rows = [("g", 1, 5), ("g", 2, 5), ("g", 3, 5), ("g", 4, 6)]
    got = _spark(spark, rows)
    assert got[("g", 4)] == (6, 5, 0, True)
    assert got[("g", 1)] == (5, 5, 0, False)


def test_robust_to_heavy_tail(spark):
    """A 100× outlier must NOT drag the center: all normal points
    stay unflagged (a mean/stddev filter would flag none or many)."""
    rows = [("g", i, 100 + (i % 7)) for i in range(20)]
    rows.append(("g", 99, 10_000))
    got = _spark(spark, rows)
    assert got[("g", 99)][3] is True
    assert all(not got[("g", i)][3] for i in range(20))


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(20)
    rows = []
    for g in ["a", "b", "c", "d"]:
        for i in range(rng.randrange(5, 60)):
            x = rng.randrange(0, 50)
            if rng.random() < 0.1:
                x *= 100
            rows.append((g, i, x))
    want = _py(rows)
    assert _spark(spark, rows) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, rid BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            profile.mad_outliers_sql("t", "grp", "rid", "x")
        ).fetchall()
    }
    assert got == want

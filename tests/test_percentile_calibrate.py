"""Percentile-rank calibration (textops.percentile_calibrate) — tie
classes share percentiles, singleton groups, a plain-Python mirror,
and DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("pct-tests", master="local[4]",
                    shuffle_partitions=8)


def _python(rows):
    from collections import defaultdict

    by_g = defaultdict(list)
    for i, g, v in rows:
        by_g[g].append((i, v))
    out = {}
    for g, members in by_g.items():
        vals = sorted(v for _, v in members)
        n = len(members)
        for i, v in members:
            rank = 1 + sum(1 for x in vals if x < v)
            pct = 0 if n == 1 else (rank - 1) * 10**6 // (n - 1)
            out[i] = (g, v, n, rank, pct)
    return out


def _spark(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, lang string, v long")
    got = textops.percentile_calibrate(
        df, "v", ["lang"], ["doc_id"]
    ).collect()
    return {
        r["doc_id"]: (r["lang"], r["v"], r["n"], r["rank"], r["pct_m"])
        for r in got
    }


def test_basic_percentiles(spark):
    rows = [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50])]
    got = _spark(spark, rows)
    assert [got[i][4] for i in range(5)] == [
        0, 250_000, 500_000, 750_000, 1_000_000
    ]


def test_ties_share_percentile(spark):
    rows = [(0, "en", 5), (1, "en", 5), (2, "en", 9)]
    got = _spark(spark, rows)
    assert got[0][4] == got[1][4] == 0
    assert got[2][4] == 1_000_000
    assert got == _python(rows)


def test_singleton_group(spark):
    got = _spark(spark, [(0, "sw", 42)])
    assert got[0] == ("sw", 42, 1, 1, 0)


def test_cross_group_independence(spark):
    """The same raw value calibrates differently per group — the
    point of the operator."""
    rows = [(0, "en", 100), (1, "en", 200), (2, "sw", 100), (3, "sw", 50)]
    got = _spark(spark, rows)
    assert got[0][4] == 0          # 100 is en's minimum
    assert got[2][4] == 1_000_000  # 100 is sw's maximum


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(777)
    rows = [
        (i, rng.choice(["en", "de", "sw"]), rng.randrange(100))
        for i in range(300)
    ]
    want = _python(rows)
    assert _spark(spark, rows) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, lang VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?)", rows)
    got = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(
            textops.percentile_calibrate_sql(
                "d", "v", ["lang"], ["doc_id"]
            )
        ).fetchall()
    }
    assert got == want

"""Wald–Wolfowitz runs test (temporal.runs_test) — hand-computed runs,
clumped vs alternating extremes, median-tie exclusion, degenerate
variance NULLs, random ≡ exact Fraction mirror ≡ DuckDB twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal
from openstreetmap_license_change_spark.operators.temporal import (
    RUNS_CHI2_05_PPM,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("runs-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, pts):
    df = spark.createDataFrame(
        [(k, t, y) for k, t, y in pts], "k string, t long, y long"
    )
    out = temporal.runs_test(df, "k", "t", "y").collect()
    return {
        r.k: (r.n_above, r.n_below, r.runs, r.z2_ppm, r.significant)
        for r in out
    }


def _mirror(pts):
    byk = {}
    for k, t, y in pts:
        byk.setdefault(k, []).append((t, y))
    out = {}
    for k, rows in byk.items():
        ys = sorted((y, t) for t, y in rows)
        med = ys[(len(ys) + 1) // 2 - 1][0]
        seq = [y > med for t, y in sorted(rows) if y != med]
        n1 = sum(seq)
        n2 = len(seq) - n1
        runs = (1 + sum(a != b for a, b in zip(seq, seq[1:]))
                if seq else 1)
        n = n1 + n2
        den = 2 * n1 * n2 * (2 * n1 * n2 - n)
        if n1 == 0 or n2 == 0 or den <= 0:
            out[k] = (n1, n2, runs, None, None)
            continue
        a = runs * n - 2 * n1 * n2 - n
        z2 = Fraction(a * a * (n - 1) * 1_000_000, den)
        out[k] = (
            n1, n2, runs, z2.numerator // z2.denominator,
            a * a * (n - 1) * 1_000_000 > RUNS_CHI2_05_PPM * den,
        )
    return out


def test_hand_computed_runs_count(spark):
    # y: 1 9 1 9 1 9 → median (lower) = 1, ties at 1 excluded →
    # seq = [T, T, T] (the 9s)… one sign only → runs=1, den degenerate
    pts = [("a", i, v) for i, v in enumerate([1, 9, 1, 9, 1, 9])]
    got = _run(spark, pts)
    assert got["a"] == (3, 0, 1, None, None)


def test_alternating_is_significant(spark):
    # perfect alternation around the median: max runs → huge z²
    vals = [0, 10] * 20 + [5]  # median 5 excluded as a tie
    pts = [("alt", i, v) for i, v in enumerate(vals)]
    got = _run(spark, pts)
    n1, n2, runs, z2, sig = got["alt"]
    assert (n1, n2, runs) == (20, 20, 40)
    assert sig is True
    assert got == _mirror(pts)


def test_clumped_is_significant(spark):
    # all lows then all highs: exactly 2 runs → strongly non-random
    # (a distinct middle value is the median so neither side ties out)
    vals = [1] * 15 + [5] + [9] * 15
    pts = [("clump", i, v) for i, v in enumerate(vals)]
    got = _run(spark, pts)
    assert got["clump"][2] == 2
    assert got["clump"][4] is True
    assert got == _mirror(pts)


def test_median_tie_exclusion(spark):
    # values equal to the nearest-rank median drop out entirely
    pts = [("m", i, v) for i, v in enumerate([3, 3, 3, 1, 9])]
    got = _run(spark, pts)
    assert got["m"][0] == 1 and got["m"][1] == 1


def test_degenerate_one_side_null(spark):
    pts = [("d", i, v) for i, v in enumerate([1, 1, 1, 9])]
    # median 1: ties excluded → only one 9 above, nothing below
    got = _run(spark, pts)
    assert got["d"][3] is None and got["d"][4] is None


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(991)
    pts = []
    for k in range(10):
        n = rng.randrange(2, 120)
        for i in range(n):
            pts.append((f"k{k}", i, rng.randrange(0, 12)))
    got = _run(spark, pts)
    assert got == _mirror(pts)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, t BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", pts)
    rows = con.execute(
        temporal.runs_test_sql("t", "k", "t", "y")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got


def test_single_key_shuffle_plan(spark):
    """The median window, join-back, and flip window all ride ONE
    key exchange (join and windows share the partitioning)."""
    pts = [("a", i, i % 5) for i in range(20)]
    df = spark.createDataFrame(pts, "k string, t long, y long")
    plan = temporal.runs_test(df, "k", "t", "y")._jdf.queryExecution(
    ).executedPlan().toString()
    # the self-join of two differently-windowed legs needs at most the
    # two legs' scans — no exchange whose key is not k, and no more
    # than the legs themselves
    import re

    assert len(re.findall(r"Exchange hashpartitioning\(k", plan)) <= 2
    assert "Exchange SinglePartition" not in plan

"""Isotonic calibration (evaluation.isotonic_calibrate) — min-max
closed form vs a Fraction-exact sequential stack PAVA (different
algorithm family), planted pooling cases, monotonicity, per-key
independence, guards, twin parity."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("isotonic-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, n_bins=10, max_bins=64):
    df = spark.createDataFrame(
        rows, "grp string, score bigint, label boolean"
    )
    out = evaluation.isotonic_calibrate(
        df, "score", "label", ["grp"], n_bins=n_bins, max_bins=max_bins
    ).collect()
    return {
        (r.grp, r.bin): (r.n, r.observed_ppm, r.iso_ppm) for r in out
    }


def _pava(rows, n_bins=10):
    """Sequential stack PAVA over exact Fractions, then floor-ppm."""
    bins = {}
    for g, s, y in rows:
        b = min(s * n_bins // 10**6, n_bins - 1)
        n, p = bins.get((g, b), (0, 0))
        bins[(g, b)] = (n + 1, p + (1 if y else 0))
    out = {}
    for g in {k[0] for k in bins}:
        seq = sorted(b for (gg, b) in bins if gg == g)
        stack = []  # [bin_list, n, pos]
        for b in seq:
            n, p = bins[(g, b)]
            stack.append([[b], n, p])
            while len(stack) >= 2 and (
                Fraction(stack[-2][2], stack[-2][1])
                >= Fraction(stack[-1][2], stack[-1][1])
            ):
                bl, n1, p1 = stack.pop()
                stack[-1][0] += bl
                stack[-1][1] += n1
                stack[-1][2] += p1
        for bl, n, p in stack:
            for b in bl:
                nn, pp = bins[(g, b)]
                out[(g, b)] = (
                    nn, pp * 10**6 // nn, p * 10**6 // n
                )
    return out


def test_planted_violation_pools(spark):
    """Two adjacent bins with rates 0.8 then 0.2, equal weight →
    both fit to the pooled 0.5."""
    rows = (
        [("a", 50_000, True)] * 4 + [("a", 50_000, False)]
        + [("a", 150_000, True)] + [("a", 150_000, False)] * 4
    )
    got = _run(spark, rows)
    assert got == {
        ("a", 0): (5, 800_000, 500_000),
        ("a", 1): (5, 200_000, 500_000),
    }


def test_weighted_pooling(spark):
    """Rates 1.0 (n=1) then 0.0 (n=3) pool to 1/4 — weights matter."""
    rows = [("a", 0, True)] + [("a", 999_999, False)] * 3
    got = _run(spark, rows)
    assert got == {
        ("a", 0): (1, 1_000_000, 250_000),
        ("a", 9): (3, 0, 250_000),
    }


def test_monotone_input_unchanged(spark):
    rows = (
        [("a", 10_000, False)] * 4 + [("a", 10_000, True)]
        + [("a", 510_000, True)] * 3 + [("a", 510_000, False)]
        + [("a", 990_000, True)] * 5
    )
    got = _run(spark, rows)
    assert got == {
        ("a", 0): (5, 200_000, 200_000),
        ("a", 5): (4, 750_000, 750_000),
        ("a", 9): (5, 1_000_000, 1_000_000),
    }


def test_keys_independent(spark):
    rows = [("a", 50_000, True), ("a", 950_000, False),
            ("b", 50_000, False), ("b", 950_000, True)]
    got = _run(spark, rows)
    assert got[("a", 0)][2] == got[("a", 9)][2] == 500_000
    assert got[("b", 0)] == (1, 0, 0)
    assert got[("b", 9)] == (1, 1_000_000, 1_000_000)


def test_random_vs_stack_pava_and_monotone(spark):
    rng = random.Random(59)
    rows = []
    for g in ("u", "v", "w"):
        for _ in range(300):
            s = rng.randrange(0, 1_000_001)
            # miscalibrated, noisy ground truth
            rows.append((g, s, rng.random() < 0.2 + 0.5 * (s > 400_000)))
    got = _run(spark, rows, n_bins=16)
    assert got == _pava(rows, n_bins=16)
    for g in ("u", "v", "w"):
        fits = [v[2] for (gg, b), v in sorted(got.items()) if gg == g]
        assert fits == sorted(fits)


def test_guards(spark):
    df = None
    with pytest.raises(ValueError, match="n_bins"):
        evaluation.isotonic_calibrate_sql("t", "s", "y", ["g"], 0)
    rows = [("a", 2_000_000, True)]
    with pytest.raises(Exception, match="outside"):
        _run(spark, rows)
    rows = [("a", i * 10_000, True) for i in range(100)]
    with pytest.raises(Exception, match="nonempty bins"):
        _run(spark, rows, n_bins=100, max_bins=8)


def test_duckdb_twin_parity(spark):
    rng = random.Random(61)
    rows = [
        (g, rng.randrange(0, 1_000_001), rng.random() < 0.5)
        for g in ("a", "b") for _ in range(200)
    ]
    got = _run(spark, rows, n_bins=12)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(grp VARCHAR, score BIGINT, label BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(
        evaluation.isotonic_calibrate_sql(
            "t", "score", "label", ["grp"], n_bins=12
        )
    ).fetchall()
    assert {(r[0], r[1]): tuple(r[2:]) for r in out} == got
    assert len(got) == 24

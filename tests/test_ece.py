"""ECE/MCE (evaluation.ece_eval) — perfectly calibrated scores give
0, deliberately miscalibrated bins hand-computed, empty bins carry
nothing, the cancelled-weights identity vs a per-bin Fraction
mirror, twin parity."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ece-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "score long, label boolean"


def _run(spark, rows, n_bins=10):
    df = spark.createDataFrame(rows, SCHEMA)
    r = evaluation.ece_eval(df, "score", "label",
                            n_bins=n_bins).collect()[0]
    return (r.n, r.n_bins, r.ece_ppm, r.mce_ppm)


def _mirror(rows, n_bins=10):
    bins = {}
    for s, y in rows:
        b = min(s * n_bins // 10**6, n_bins - 1)
        n, ss, pos = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, ss + s, pos + (1 if y else 0))
    N = sum(n for n, _, _ in bins.values())
    tot = sum(abs(pos * 10**6 - ss) for _, ss, pos in bins.values())
    mce = max(abs(pos * 10**6 - ss) // n
              for n, ss, pos in bins.values())
    return (N, n_bins, tot // N, mce)


def test_perfectly_calibrated_zero(spark):
    # bin at 250000 ppm: exactly 1 in 4 positive, scores constant
    rows = [(250_000, True)] + [(250_000, False)] * 3 \
        + [(750_000, True)] * 3 + [(750_000, False)]
    got = _run(spark, rows)
    assert got == (8, 10, 0, 0)


def test_miscalibrated_hand_value(spark):
    # all scores 900000, nothing positive → ECE = MCE = 900000
    rows = [(900_000, False)] * 5
    assert _run(spark, rows) == (5, 10, 900_000, 900_000)


def test_mce_picks_worst_bin(spark):
    # bin 0 perfect (score 0, negative); bin 9 off by 10⁶
    rows = [(0, False)] * 5 + [(999_999, False)] * 5
    n, nb, ece, mce = _run(spark, rows)
    assert mce == 999_999
    assert ece == (5 * 999_999) // 10   # half the mass perfect


def test_guard(spark):
    df = spark.createDataFrame([(2_000_000, True)], SCHEMA)
    with pytest.raises(Exception, match="outside"):
        evaluation.ece_eval(df, "score", "label").collect()
    with pytest.raises(ValueError, match="n_bins"):
        evaluation.ece_eval(None, "s", "y", n_bins=0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(909)
    rows = [
        (rng.randrange(0, 1_000_001), rng.random() < 0.4)
        for _ in range(500)
    ]
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(score BIGINT, label BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(
        evaluation.ece_eval_sql("t", "score", "label")
    ).fetchall()[0]
    assert tuple(out) == got

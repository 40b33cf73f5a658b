"""Seasonal MASE (temporal.seasonal_mase) — perfect seasonality
scores 0, constant series NULL, hand-pinned cross-multiplied ratio,
random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("mase-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "k string, t long, x long"


def _run(spark, rows, season=2):
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.seasonal_mase(df, "k", "t", "x",
                                 season=season).collect()
    return {r.k: (r.n_season, r.sum_abs_season, r.n_naive,
                  r.sum_abs_naive, r.mase_ppm) for r in out}


def _mirror(rows, season=2):
    by = {}
    for k, t, x in rows:
        by.setdefault(k, []).append((t, x))
    out = {}
    for k, pts in by.items():
        xs = [x for _, x in sorted(pts)]
        em = [abs(xs[i] - xs[i - season])
              for i in range(season, len(xs))]
        e1 = [abs(xs[i] - xs[i - 1]) for i in range(1, len(xs))]
        nm, sm = len(em), sum(em)
        n1, s1 = len(e1), sum(e1)
        mase = (None if s1 == 0 or nm == 0
                else (sm * n1 * 10**6) // (nm * s1))
        out[k] = (nm, sm, n1, s1, mase)
    return out


def test_perfect_seasonality_scores_zero(spark):
    rows = [("s", t, [10, 50][t % 2]) for t in range(10)]
    got = _run(spark, rows, season=2)
    assert got["s"][1] == 0 and got["s"][4] == 0
    assert got == _mirror(rows, season=2)


def test_constant_series_null(spark):
    rows = [("c", t, 7) for t in range(8)]
    got = _run(spark, rows, season=2)
    assert got["c"][4] is None


def test_hand_pinned_no_gain(spark):
    # alternating series scored at the WRONG season (3): seasonal
    # errors equal naive errors per step → mase exactly 10⁶
    rows = [("w", t, [1, 2][t % 2]) for t in range(6)]
    got = _run(spark, rows, season=3)
    assert got["w"] == (3, 3, 5, 5, 1_000_000)
    assert got == _mirror(rows, season=3)


def test_validation(spark):
    with pytest.raises(ValueError, match="season"):
        _run(spark, [("a", 0, 1)], season=1)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(717171)
    rows = []
    for k in range(12):
        base = rng.randrange(10, 50)
        for t in range(rng.randrange(10, 60)):
            rows.append(
                (f"k{k}", t,
                 base + (t % 24) * 3 + rng.randrange(-4, 5))
            )
    got = _run(spark, rows, season=24)
    assert got == _mirror(rows, season=24)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, t BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(temporal.seasonal_mase_sql(
        "t", "k", "t", "x", season=24
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

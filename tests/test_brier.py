"""Brier score (evaluation.brier_score) — perfect/anti predictor
extremes, confident-wrongness punishment vs accuracy, no-skill floor
identity, out-of-range loud guard, random ≡ Python mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("brier-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "grp string, p long, y boolean")
    out = evaluation.brier_score(df, "grp", "p", "y").collect()
    return {
        r.grp: (r.n, r.n_pos, r.brier_ppm2, r.uncertainty_ppm2)
        for r in out
    }


def _mirror(rows):
    byg = {}
    for g, p, y in rows:
        byg.setdefault(g, []).append((p, 1 if y else 0))
    out = {}
    for g, rs in byg.items():
        n = len(rs)
        npos = sum(y for _, y in rs)
        sq = sum((p - y * 1_000_000) ** 2 for p, y in rs)
        out[g] = (n, npos, sq // n,
                  (npos * (n - npos) * 10**12) // (n * n))
    return out


def test_perfect_predictor_zero(spark):
    rows = [("p", 1_000_000, True), ("p", 0, False)] * 3
    got = _run(spark, rows)
    assert got["p"][2] == 0


def test_confident_wrongness_punished(spark):
    # both predictors are 50% accurate; the confident one scores worse
    rows = [("conf", 1_000_000, False), ("conf", 1_000_000, True),
            ("hedge", 500_000, False), ("hedge", 500_000, True)]
    got = _run(spark, rows)
    assert got["conf"][2] > got["hedge"][2]
    assert got["hedge"][2] == 250_000_000_000  # (0.5)² in ppm²


def test_no_skill_floor_identity(spark):
    # predicting the base rate everywhere scores EXACTLY uncertainty
    rows = [("u", 250_000, True)] * 1 + [("u", 250_000, False)] * 3
    got = _run(spark, rows)
    assert got["u"][2] == got["u"][3] == 187_500_000_000


def test_out_of_range_fails_loud(spark):
    rows = [("x", 2_000_000, True)]
    with pytest.raises(Exception, match="ppm range"):
        _run(spark, rows)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(909)
    rows = []
    for g in range(6):
        for _ in range(rng.randrange(1, 100)):
            rows.append((f"g{g}", rng.randrange(0, 1_000_001),
                         rng.random() < 0.4))
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(grp VARCHAR, p BIGINT, y BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(
        evaluation.brier_score_sql("t", "grp", "p", "y")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

"""Wald SPRT (evaluation.sprt_decision) — planted early stops both
directions, continue band, first-crossing exactness, duplicate-trial
guard, validation, random ≡ scan mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation

C1, C0 = 200_671, -200_671       # ln(.55/.45), ln(.45/.55) ppm
A, B = 2_944_439, -2_944_439     # ln(19), ln(1/19) ppm


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("sprt-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "k string, t long, s int"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = evaluation.sprt_decision(
        df, "k", "t", "s", C1, C0, A, B
    ).collect()
    return {r.k: (r.n_total, r.k_total, r.llr_final_ppm, r.decision,
                  r.n_decide, r.llr_decide_ppm) for r in out}


def _mirror(rows):
    by = {}
    for k, t, s in rows:
        by.setdefault(k, []).append((t, s))
    out = {}
    for k, pts in by.items():
        pts.sort()
        llr, kk = 0, 0
        nd = ld = None
        for n, (_, s) in enumerate(pts, 1):
            kk += s
            llr = kk * C1 + (n - kk) * C0
            if nd is None and (llr >= A or llr <= B):
                nd, ld = n, llr
        dec = "continue" if nd is None else (
            "accept_h1" if ld >= A else "accept_h0"
        )
        out[k] = (len(pts), kk, llr, dec, nd, ld)
    return out


def test_planted_early_stops(spark):
    # 15 straight successes cross A at n=15 (15·200671 ≥ 2944439),
    # later failures don't un-decide; mirror-image for H0
    up = [("up", t, 1) for t in range(20)]
    dn = [("dn", t, 0) for t in range(20)]
    got = _run(spark, up + dn)
    assert got["up"][3] == "accept_h1" and got["up"][4] == 15
    assert got["dn"][3] == "accept_h0" and got["dn"][4] == 15
    assert got == _mirror(up + dn)


def test_continue_band(spark):
    rows = [("c", t, t % 2) for t in range(40)]   # perfectly balanced
    got = _run(spark, rows)
    assert got["c"][3] == "continue"
    assert got["c"][4] is None
    assert got == _mirror(rows)


def test_first_crossing_is_reported(spark):
    # cross A at 15, keep rising: n_decide must stay 15
    rows = [("f", t, 1) for t in range(30)]
    got = _run(spark, rows)
    assert got["f"][4] == 15
    assert got["f"][5] == 15 * C1


def test_duplicate_positions_raise(spark):
    df = spark.createDataFrame(
        [("d", 1, 1), ("d", 1, 0)], SCHEMA
    )
    with pytest.raises(ValueError, match="duplicate"):
        evaluation.sprt_decision(df, "k", "t", "s", C1, C0, A, B)


def test_validation(spark):
    df = spark.createDataFrame([("v", 1, 1)], SCHEMA)
    with pytest.raises(ValueError, match="llr_neg"):
        evaluation.sprt_decision(df, "k", "t", "s", C1, 1, A, B)
    with pytest.raises(ValueError, match="b_ppm"):
        evaluation.sprt_decision(df, "k", "t", "s", C1, C0, A, 1)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(1234)
    rows = []
    for k in range(30):
        p = rng.choice([0.3, 0.5, 0.7])
        for t in range(rng.randrange(5, 120)):
            rows.append((f"k{k:02d}", t, int(rng.random() < p)))
    got = _run(spark, rows)
    assert got == _mirror(rows)
    assert {v[3] for v in got.values()} == \
        {"accept_h1", "accept_h0", "continue"}

    con = duckdb.connect()
    con.execute("CREATE TABLE tr(k VARCHAR, t BIGINT, s INTEGER)")
    con.executemany("INSERT INTO tr VALUES (?, ?, ?)", rows)
    out = con.execute(evaluation.sprt_decision_sql(
        "tr", "k", "t", "s", C1, C0, A, B
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

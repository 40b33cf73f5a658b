"""Benford first-digit profile (profile.benford_profile) — dense grid
with zero-count digits, exclusion accounting, exact TVD, a planted
Benford-conforming geometric sample vs a planted uniform one, random ≡
Python mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import profile
from openstreetmap_license_change_spark.operators.profile import (
    BENFORD_PPM,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("benford-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "sl string, y long")
    out = profile.benford_profile(df, "sl", "y").collect()
    return {
        (r.sl, r.digit): (r.n_digit, r.n_total, r.n_excluded,
                          r.obs_ppm, r.exp_ppm, r.dev_ppm, r.tvd_ppm)
        for r in out
    }


def _mirror(rows):
    bysl = {}
    for sl, y in rows:
        bysl.setdefault(sl, []).append(y)
    out = {}
    for sl, ys in bysl.items():
        pos = [y for y in ys if y is not None and y > 0]
        exc = len(ys) - len(pos)
        cnt = {d: 0 for d in range(1, 10)}
        for y in pos:
            cnt[int(str(y)[0])] += 1
        n = len(pos)
        obs = {d: (cnt[d] * 1_000_000) // n if n else None
               for d in range(1, 10)}
        dev = {d: (obs[d] - BENFORD_PPM[d - 1]) if n else None
               for d in range(1, 10)}
        tvd = (sum(abs(v) for v in dev.values()) // 2) if n else None
        for d in range(1, 10):
            out[(sl, d)] = (cnt[d], n, exc, obs[d],
                            BENFORD_PPM[d - 1], dev[d], tvd)
    return out


def test_dense_grid_with_zero_digits(spark):
    rows = [("s", 1), ("s", 19), ("s", 100)]  # only digit 1 appears
    got = _run(spark, rows)
    assert len([k for k in got if k[0] == "s"]) == 9
    assert got[("s", 1)][0] == 3
    assert got[("s", 7)][0] == 0
    assert got[("s", 7)][3] == 0  # obs_ppm present, zero


def test_exclusion_counted_not_silent(spark):
    rows = [("s", 5), ("s", 0), ("s", -3), ("s", None)]
    got = _run(spark, rows)
    assert got[("s", 5)][1] == 1 and got[("s", 5)][2] == 3


def test_exact_tvd_single_digit_corpus(spark):
    # everything starts with 9: obs = 10⁶ at d=9, 0 elsewhere
    # TVD = (|10⁶−45757| + Σ_{d≠9} exp_d)/2 = (954243+954243)/2
    rows = [("s", 9_000 + i) for i in range(10)]
    got = _run(spark, rows)
    assert got[("s", 9)][6] == 954_243


def test_benford_vs_uniform_separation(spark):
    """A geometric (scale-free) sample lands near Benford; a uniform
    3-digit sample does not — the operator's whole point."""
    rng = random.Random(7)
    geo = []
    x = 1.0
    for _ in range(4000):
        x *= 1.01
        if x > 10**9:
            x = x / 10**8
        geo.append(("geo", int(x) + 1))
    uni = [("uni", rng.randrange(100, 1000)) for _ in range(4000)]
    got = _run(spark, geo + uni)
    assert got[("geo", 1)][6] < 60_000       # close to Benford
    assert got[("uni", 1)][6] > 150_000      # far from Benford


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(31)
    rows = []
    for sl in range(6):
        for _ in range(rng.randrange(1, 200)):
            rows.append((f"s{sl}", rng.randrange(-5, 10**6)))
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(sl VARCHAR, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(
        profile.benford_profile_sql("t", "sl", "y")
    ).fetchall()
    assert {(r[0], r[1]): tuple(r[2:]) for r in out} == got

"""Trimmed mean (profile.trimmed_mean) — outlier immunity vs the raw
mean, nearest-rank positional trim, zero-trim identity, negative
truncation, guard, random ≡ Python mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import profile


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("trimmean-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, trim=100_000):
    df = spark.createDataFrame(rows, "grp string, v long")
    out = profile.trimmed_mean(df, "grp", "v", trim_ppm=trim).collect()
    return {
        r.grp: (r.n, r.n_trimmed_each, r.kept_sum, r.mean_q)
        for r in out
    }


def _mirror(rows, trim=100_000):
    byg = {}
    for g, v in rows:
        byg.setdefault(g, []).append(v)
    out = {}
    for g, vs in byg.items():
        vs.sort()
        n = len(vs)
        k = (n * trim) // 1_000_000
        kept = vs[k:n - k]
        s = sum(kept)
        m = -((-s) // len(kept)) if s < 0 else s // len(kept)
        out[g] = (n, k, s, m)
    return out


def test_outlier_immunity(spark):
    rows = [("g", v) for v in [10, 11, 12, 13, 14, 15, 16, 17, 18,
                               10**9]]
    got = _run(spark, rows, trim=100_000)
    # k = 1: the 10⁹ outlier AND the min are dropped
    assert got["g"][1] == 1
    assert got["g"][3] == sum([11, 12, 13, 14, 15, 16, 17, 18]) // 8


def test_zero_trim_is_plain_mean(spark):
    rows = [("g", v) for v in (2, 4, 9)]
    got = _run(spark, rows, trim=0)
    assert got["g"] == (3, 0, 15, 5)


def test_negative_mean_truncates(spark):
    rows = [("g", -1), ("g", -1), ("g", 1)]
    got = _run(spark, rows, trim=0)
    assert got["g"][3] == 0  # trunc(-1/3)


def test_trim_guard(spark):
    with pytest.raises(ValueError, match="trim_ppm"):
        profile.trimmed_mean(None, "g", "v", trim_ppm=500_000)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(404)
    rows = []
    for g in range(8):
        for _ in range(rng.randrange(1, 120)):
            rows.append((f"g{g}", rng.randrange(-1000, 10**6)))
    got = _run(spark, rows, trim=150_000)
    assert got == _mirror(rows, trim=150_000)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(grp VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(profile.trimmed_mean_sql(
        "t", "grp", "v", trim_ppm=150_000
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

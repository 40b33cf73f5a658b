"""Quantile normalization (profile.quantile_normalize) — nearest-rank
grid exactness, cross-slice reference mean with sign-decomposed floor,
small-slice repetition, identical-slices fixpoint, random ≡ Python
mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import profile


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("qnorm-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, q=4):
    df = spark.createDataFrame(rows, "sl string, id long, v long")
    out = profile.quantile_normalize(
        df, "sl", "id", "v", q_bins=q
    ).collect()
    return {(r.sl, r.q): (r.q_value, r.ref_value) for r in out}


def _mirror(rows, q=4):
    bysl = {}
    for sl, i, v in rows:
        bysl.setdefault(sl, []).append((v, i))
    quants = {}
    for sl, vs in bysl.items():
        vs.sort()
        n = len(vs)
        for qq in range(1, q + 1):
            r = (qq * n + q - 1) // q
            quants[(sl, qq)] = vs[r - 1][0]
    ref = {}
    for qq in range(1, q + 1):
        xs = [quants[(sl, qq)] for sl in bysl]
        s, n = sum(xs), len(xs)
        ref[qq] = -((-s) // n) if s < 0 else s // n
    return {k: (v, ref[k[1]]) for k, v in quants.items()}


def test_exact_grid_two_slices(spark):
    # slice a: 1..4 → quartiles 1,2,3,4 ; slice b: 11..14
    rows = [("a", i, i) for i in range(1, 5)]
    rows += [("b", i, 10 + i) for i in range(1, 5)]
    got = _run(spark, rows, q=4)
    assert got[("a", 1)] == (1, 6)    # ref = (1+11)//2
    assert got[("a", 4)] == (4, 9)
    assert got[("b", 2)] == (12, 7)


def test_small_slice_repeats_rows(spark):
    rows = [("s", 1, 100), ("s", 2, 200), ("t", 1, 0), ("t", 2, 0),
            ("t", 3, 0), ("t", 4, 0)]
    got = _run(spark, rows, q=4)
    # n_s=2: q=1,2 → rank 1; q=3,4 → rank 2
    assert got[("s", 1)][0] == 100 and got[("s", 2)][0] == 100
    assert got[("s", 3)][0] == 200 and got[("s", 4)][0] == 200


def test_identical_slices_fixpoint(spark):
    rows = [(sl, i, i * 7) for sl in "ab" for i in range(1, 9)]
    got = _run(spark, rows, q=4)
    for (sl, qq), (v, ref) in got.items():
        assert v == ref


def test_negative_reference_truncates_toward_zero(spark):
    rows = [("a", 1, -1), ("b", 1, -2), ("c", 1, 2)]
    got = _run(spark, rows, q=1)
    # ref = trunc(-1/3) = 0
    assert got[("a", 1)] == (-1, 0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(135)
    rows = []
    for sl in range(6):
        for i in range(rng.randrange(3, 80)):
            rows.append((f"s{sl}", i, rng.randrange(-500, 500)))
    got = _run(spark, rows, q=10)
    assert got == _mirror(rows, q=10)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(sl VARCHAR, id BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(profile.quantile_normalize_sql(
        "t", "sl", "id", "v", q_bins=10
    )).fetchall()
    assert {(r[0], r[1]): (r[2], r[3]) for r in out} == got

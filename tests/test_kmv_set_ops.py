"""KMV sketch set operations (sketches.kmv_set_ops) — exact on
sub-k sets, estimator-accurate on large sets, mergeable (merged
sketches ≡ sketch of the union), Python mirror + DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import sketches
from openstreetmap_license_change_spark.operators.sketches import (
    _KMV_MULT, _TWO31, _TWO32,
)

M = 1_000_000


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("kmv-setops-tests", master="local[4]",
                    shuffle_partitions=8)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v bigint")


def _run(spark, a, b, k=64):
    out = sketches.kmv_set_ops(
        _df(spark, a), _df(spark, b), "g", "v", k=k
    ).collect()
    return {
        r.g: (r.n_a_kept, r.n_b_kept, r.union_kept, r.matches,
              r.est_union, r.est_intersection, r.jaccard_ppm)
        for r in out
    }


def _hash(v):
    h = (v % _TWO31) * _KMV_MULT % _TWO32
    return (h ^ (h >> 16)) % _TWO32


def _python_mirror(a_rows, b_rows, k):
    groups = {g for g, _ in a_rows} | {g for g, _ in b_rows}
    out = {}
    for g in groups:
        sa = sorted(
            {(_hash(v), v) for gg, v in a_rows if gg == g}
        )[:k]
        sb = sorted(
            {(_hash(v), v) for gg, v in b_rows if gg == g}
        )[:k]
        ka = {v for _, v in sa}
        kb = {v for _, v in sb}
        union = sorted({(h, v) for h, v in sa + sb})[:k]
        uk = len(union)
        m = sum(1 for _, v in union if v in ka and v in kb)
        kth = union[-1][0] if union else 0
        est_u = uk if uk < k else ((k - 1) * _TWO32) // max(kth, 1)
        out[g] = (
            sum(1 for _, v in union if v in ka),
            sum(1 for _, v in union if v in kb),
            uk,
            m,
            est_u,
            (m * est_u) // uk if uk else None,
            (m * M) // uk if uk else None,
        )
    return out


def test_small_sets_exact(spark):
    a = [("a", v) for v in range(1, 11)]
    b = [("a", v) for v in range(6, 16)]
    got = _run(spark, a, b)
    n_a, n_b, uk, m, eu, ei, j = got["a"]
    assert (n_a, n_b, uk, m) == (10, 10, 15, 5)
    assert eu == 15 and ei == 5
    assert j == (5 * M) // 15


def test_disjoint_and_identical(spark):
    a = [("d", v) for v in range(10)] + [("i", v) for v in range(7)]
    b = [("d", v) for v in range(100, 110)] + [
        ("i", v) for v in range(7)
    ]
    got = _run(spark, a, b)
    assert got["d"][3] == 0 and got["d"][6] == 0       # matches, jaccard
    assert got["d"][4] == 20                           # exact union
    assert got["i"][6] == M and got["i"][5] == got["i"][4] == 7


def test_one_sided_group(spark):
    a = [("only_a", v) for v in range(5)]
    b = [("only_b", v) for v in range(3)]
    got = _run(spark, a, b)
    assert got["only_a"] == (5, 0, 5, 0, 5, 0, 0)
    assert got["only_b"] == (0, 3, 3, 0, 3, 0, 0)


def test_duplicates_ignored(spark):
    """Input multiplicity must not matter — sets, not bags."""
    a = [("a", v % 5) for v in range(50)]
    b = [("a", v % 8) for v in range(80)]
    got = _run(spark, a, b)
    assert got["a"][2] == 8 and got["a"][3] == 5       # union, matches
    assert got["a"][4] == 8 and got["a"][5] == 5


def test_large_sets_estimator_accuracy(spark):
    """Planted 50% Jaccard at 3000 distinct values, k=128: estimates
    within ~3/√k relative error (regression-pinned, not asserted
    tight)."""
    shared = list(range(0, 2000))
    a = [("a", v) for v in shared + list(range(10_000, 11_000))]
    b = [("a", v) for v in shared + list(range(20_000, 21_000))]
    got = _run(spark, a, b, k=128)
    _, _, uk, m, eu, ei, j = got["a"]
    assert uk == 128
    assert abs(eu - 4000) < 4000 * 0.35
    assert abs(j - 500_000) < 500_000 * 0.35
    assert abs(ei - 2000) < 2000 * 0.5


def test_mergeable_union_matches_direct_sketch(spark):
    """est_union from the two merged sketches equals kmv_distinct on
    the concatenated input — the mergeability identity, exact."""
    rng = random.Random(9)
    a = [("a", rng.randrange(100_000)) for _ in range(600)]
    b = [("a", rng.randrange(100_000)) for _ in range(600)]
    got = _run(spark, a, b, k=64)
    both = _df(spark, a + b)
    direct = sketches.kmv_distinct(both, "g", "v", k=64).collect()[0]
    assert got["a"][4] == direct.est_distinct


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(21)
    a, b = [], []
    for g in ["g0", "g1", "g2"]:
        pool = rng.sample(range(50_000), 400)
        cut = rng.randrange(100, 300)
        a += [(g, v) for v in pool[:cut]]
        b += [(g, v) for v in pool[cut - 50:]]          # 50 shared
    got = _run(spark, a, b, k=64)
    want = _python_mirror(a, b, k=64)
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE a_t(g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO a_t VALUES (?, ?)", a)
    con.execute("CREATE TABLE b_t(g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO b_t VALUES (?, ?)", b)
    rows = con.execute(
        sketches.kmv_set_ops_sql("a_t", "b_t", "g", "v", k=64)
    ).fetchall()
    got_sql = {r[0]: tuple(r[1:]) for r in rows}
    assert got == got_sql


def test_k_validated(spark):
    with pytest.raises(ValueError):
        sketches.kmv_set_ops_sql("a", "b", "g", "v", k=1)

"""One-way ANOVA (evaluation.anova_oneway) — hand-computed F and η²,
perfect separation, identical-groups zero, degenerate slices, random ≡
exact Fraction mirror ≡ DuckDB twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("anova-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "sl string, g string, y long"
    )
    out = evaluation.anova_oneway(df, "sl", "g", "y").collect()
    return {
        r.sl: (r.k_groups, r.n, r.ssb_micro, r.ssw_micro,
               r.f_ppm, r.eta2_ppm)
        for r in out
    }


def _mirror(rows):
    bysl = {}
    for sl, g, y in rows:
        bysl.setdefault(sl, {}).setdefault(g, []).append(y)
    out = {}
    for sl, groups in bysl.items():
        k = len(groups)
        n = sum(len(v) for v in groups.values())
        t = sum(sum(v) for v in groups.values())
        s = sum(y * y for v in groups.values() for y in v)
        bsum = sum(
            (sum(v) ** 2 * 1_000_000) // len(v)
            for v in groups.values()
        )
        ssb = max(0, bsum - (t * t * 1_000_000) // n)
        ssw = s * 1_000_000 - bsum
        if k < 2 or n <= k:
            f = e = None
        else:
            f = (None if ssw == 0
                 else ((n - k) * ssb * 1_000_000) // ((k - 1) * ssw))
            e = (None if ssb + ssw == 0
                 else (ssb * 1_000_000) // (ssb + ssw))
        out[sl] = (k, n, ssb, ssw, f, e)
    return out


def test_hand_computed(spark):
    # groups a={1,3} (T=4,n=2), b={5,7} (T=12,n=2): N=4 T=16 S=84
    # bsum = 8e6 + 72e6 = 80e6 ; T²·10⁶/N = 64e6 → SSB = 16e6
    # SSW = 84e6 − 80e6 = 4e6 ; F = (2/1)·(16/4) = 8 → 8e6 ppm
    # η² = 16/20 = 0.8 → 800000
    rows = [("s", "a", 1), ("s", "a", 3), ("s", "b", 5), ("s", "b", 7)]
    got = _run(spark, rows)
    assert got["s"] == (2, 4, 16_000_000, 4_000_000,
                        8_000_000, 800_000)


def test_perfect_separation_infinite_f(spark):
    rows = [("s", "a", 2), ("s", "a", 2), ("s", "b", 9), ("s", "b", 9)]
    got = _run(spark, rows)
    assert got["s"][3] == 0        # SSW = 0
    assert got["s"][4] is None     # F infinite → NULL
    assert got["s"][5] == 1_000_000


def test_identical_groups_zero_ssb(spark):
    # equal means: the k independent floors may undershoot by ≤ k
    # µ-units — the clamp pins ssb to exactly 0 here
    rows = [("s", "a", 5), ("s", "a", 7), ("s", "b", 5), ("s", "b", 7)]
    got = _run(spark, rows)
    assert got["s"][2] == 0
    assert got["s"][4] == 0 and got["s"][5] == 0


def test_degenerate_single_group_and_saturated(spark):
    rows = [("one", "a", 1), ("one", "a", 2),
            ("sat", "a", 1), ("sat", "b", 2)]
    got = _run(spark, rows)
    assert got["one"][4] is None and got["one"][5] is None
    assert got["sat"][4] is None  # n == k


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(2027)
    rows = []
    for sl in range(8):
        for g in range(rng.randrange(1, 6)):
            for _ in range(rng.randrange(1, 30)):
                rows.append(
                    (f"s{sl}", f"g{g}", rng.randrange(0, 1000))
                )
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(sl VARCHAR, g VARCHAR, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(
        evaluation.anova_oneway_sql("t", "sl", "g", "y")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got


def test_two_nested_aggregations_plan(spark):
    rows = [("s", "a", 1), ("s", "b", 2)]
    df = spark.createDataFrame(rows, "sl string, g string, y long")
    plan = evaluation.anova_oneway(df, "sl", "g", "y")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "Join" not in plan and "Window" not in plan

"""Exact nearest-rank group quantiles (operators/textops.py
group_quantiles): value at rank ceil(q*n) with int64 rank arithmetic —
brute-force parity incl. ties and single-row groups, plus the
single-window plan claim."""

import math
import random

import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("quantile-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


def _brute(rows, qs_m):
    from collections import defaultdict

    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    out = set()
    for g, vs in groups.items():
        vs.sort()
        for q in qs_m:
            rank = (q * len(vs) + 999_999) // 1_000_000  # ceil(q*n)
            out.add((g, q, vs[rank - 1]))
    return out


def test_matches_bruteforce_with_ties_and_singletons(spark):
    rng = random.Random(5)
    rows = [("a", rng.randint(0, 20)) for _ in range(97)]       # heavy ties
    rows += [("b", rng.randint(0, 10**6)) for _ in range(50)]   # spread
    rows += [("c", 42)]                                         # singleton
    df = spark.createDataFrame(rows, "grp string, v bigint")
    qs = (1, 250_000, 500_000, 900_000, 990_000, 1_000_000)
    got = {
        (r.grp, r.q_m, r.quantile_value)
        for r in textops.group_quantiles(df, "v", ["grp"], qs_m=qs).collect()
    }
    assert got == _brute(rows, qs)
    # q=1 (min) and q=1e6 (max) sanity
    a_vals = sorted(v for g, v in rows if g == "a")
    assert ("a", 1, a_vals[0]) in got and ("a", 1_000_000, a_vals[-1]) in got


def test_single_window_execution(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)], "grp string, v bigint"
    )
    plan = (
        textops.group_quantiles(df, "v", ["grp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one Window node covering both row_number and count — a union of
    # per-quantile filters would repeat it
    assert plan.count("Window") - plan.count("WindowGroupLimit") >= 1
    assert plan.count("row_number") == 1, plan

"""Two-sample Kolmogorov–Smirnov (evaluation.ks_two_sample): exact
cross-multiplied D per group one-vs-rest, pooled-value evaluation
grid, smallest-v argmax tie-break, Python mirror, DuckDB twin."""

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import evaluation as ev


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ks-tests", master="local[4]",
                    shuffle_partitions=8)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def _mirror(rows):
    """Exact one-vs-rest KS per group on (g, v) int tuples."""
    from collections import Counter

    by_gv = Counter(rows)
    vals = sorted({v for _, v in rows})
    groups = sorted({g for g, _ in rows})
    n_tot = len(rows)
    out = {}
    for g in groups:
        n_in = sum(c for (gg, _), c in by_gv.items() if gg == g)
        n_rest = n_tot - n_in
        cum_in = cum_tot = 0
        best = None
        for v in vals:
            cum_in += by_gv.get((g, v), 0)
            cum_tot += sum(
                c for (gg, vv), c in by_gv.items() if vv == v
            )
            d = abs(n_rest * cum_in - n_in * (cum_tot - cum_in))
            if best is None or d > best[0]:
                best = (d, v)
        d_ppm = (
            best[0] * 10**6 // (n_in * n_rest) if n_rest else None
        )
        out[g] = (n_in, n_rest, d_ppm, best[1])
    return out


def test_ks_hand_case(spark):
    # A=[1,2], B=[1,3,3]: F_A(2)=1, F_B(2)=1/3 -> D=2/3 at v=2.
    rows = [("a", 1), ("a", 2), ("b", 1), ("b", 3), ("b", 3)]
    got = {
        r.g: (r.n_in, r.n_rest, r.d_ppm, r.d_at)
        for r in ev.ks_two_sample(_df(spark, rows), "g", "v").collect()
    }
    assert got["a"] == (2, 3, 666666, 2)
    # symmetric: b-vs-rest is the same comparison.
    assert got["b"] == (3, 2, 666666, 2)


def test_ks_identical_distributions(spark):
    # same multiset in both groups -> D = 0, argmax = smallest value.
    rows = [("a", 5), ("a", 9), ("b", 5), ("b", 9)]
    got = {
        r.g: (r.d_ppm, r.d_at)
        for r in ev.ks_two_sample(_df(spark, rows), "g", "v").collect()
    }
    assert got == {"a": (0, 5), "b": (0, 5)}


def test_ks_rest_jump_between_group_points(spark):
    # the max is attained at a REST-only value: a={0,10}, b={5,5,5}.
    # At v=5: F_a=1/2, F_b=1 -> D=1/2; at a-points D=|.5-0|=.5 and
    # |1-1|=0.  Tie 0 vs 5 at d=1/2 -> smallest v wins (v=0).
    # Make it strict instead: a={0,10,10}, b={5,5}: v=0: F_a=1/3,F_b=0
    # d=1/3; v=5: 1/3 vs 1 -> 2/3; v=10: 0.  Max at rest-only v=5.
    rows = [("a", 0), ("a", 10), ("a", 10), ("b", 5), ("b", 5)]
    got = {
        r.g: (r.d_ppm, r.d_at)
        for r in ev.ks_two_sample(_df(spark, rows), "g", "v").collect()
    }
    assert got["a"] == (666666, 5)


def test_ks_single_group_null(spark):
    rows = [("a", 1), ("a", 2)]
    r = ev.ks_two_sample(_df(spark, rows), "g", "v").collect()[0]
    assert r.n_rest == 0 and r.d_ppm is None


def test_ks_mirror_randomized(spark):
    rows = [
        (f"g{(i * 7) % 3}", (i * i * 13 + i) % 17)
        for i in range(200)
    ]
    got = {
        r.g: (r.n_in, r.n_rest, r.d_ppm, r.d_at)
        for r in ev.ks_two_sample(_df(spark, rows), "g", "v").collect()
    }
    assert got == _mirror(rows)


def test_ks_max_groups_guard(spark):
    rows = [(f"g{i}", i) for i in range(5)]
    with pytest.raises(Exception, match="max_groups"):
        ev.ks_two_sample(
            _df(spark, rows), "g", "v", max_groups=3
        ).collect()


def test_ks_duckdb_twin(spark):
    rows = [
        (f"g{(i * 11) % 4}", (i * 3 + (i % 7)) % 23)
        for i in range(300)
    ]
    got = sorted(
        (r.g, r.n_in, r.n_rest, r.d_ppm, r.d_at)
        for r in ev.ks_two_sample(_df(spark, rows), "g", "v").collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v"]))
    want = sorted(
        map(tuple, con.execute(
            ev.ks_two_sample_sql("t", "g", "v")
        ).fetchall())
    )
    assert got == want

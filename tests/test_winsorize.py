"""Winsorization audit at exact group quantiles (textops.winsorize)."""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("winsorize-tests", master="local[4]",
                    shuffle_partitions=8)


def test_outliers_clamped_exactly(spark):
    """100 values 1..100 plus two 10⁶ spikes: at [p5, p95] the cuts
    are the exact nearest-rank order statistics and the winsorized
    sum is hand-computable."""
    vals = list(range(1, 101)) + [10**6, 10**6]
    rows = [(1, v) for v in vals]
    df = spark.createDataFrame(rows, "g int, v bigint")
    out = textops.winsorize(df, "v", ["g"], lo_m=50_000,
                            hi_m=950_000).collect()[0]
    n = 102
    lo_rank = (50_000 * n + 999_999) // 1_000_000   # 6 → value 6
    hi_rank = (950_000 * n + 999_999) // 1_000_000  # 97 → value 97
    assert (out.lo_cut, out.hi_cut) == (sorted(vals)[lo_rank - 1],
                                        sorted(vals)[hi_rank - 1])
    want_sum = sum(min(max(v, out.lo_cut), out.hi_cut) for v in vals)
    assert out.sum_winsorized == want_sum
    assert out.n_clamped_lo == sum(1 for v in vals if v < out.lo_cut)
    assert out.n_clamped_hi == sum(1 for v in vals if v > out.hi_cut)
    assert out.sum_raw == sum(vals)


def test_no_op_when_no_outliers(spark):
    """Full-range cuts [p0-ish, p100]: nothing clamps above; the
    winsorized sum can only move DOWNWARD from below via lo."""
    rows = [(1, v) for v in range(10)]
    df = spark.createDataFrame(rows, "g int, v bigint")
    out = textops.winsorize(df, "v", ["g"], lo_m=0,
                            hi_m=1_000_000).collect()[0]
    assert out.n_clamped_hi == 0
    assert out.sum_winsorized >= out.sum_raw  # lo clamp raises minima


def test_groups_independent(spark):
    rows = [(1, v) for v in range(100)] + [(2, v * 100) for v in range(100)]
    df = spark.createDataFrame(rows, "g int, v bigint")
    out = {r.g: r for r in textops.winsorize(
        df, "v", ["g"], lo_m=100_000, hi_m=900_000).collect()}
    assert out[2].lo_cut == out[1].lo_cut * 100
    assert out[2].hi_cut == out[1].hi_cut * 100


def test_bounds_validated(spark):
    df = spark.createDataFrame([(1, 1)], "g int, v int")
    with pytest.raises(ValueError):
        textops.winsorize(df, "v", ["g"], lo_m=600_000, hi_m=400_000)
    with pytest.raises(ValueError):
        textops.winsorize(df, "v", ["g"], lo_m=-1)


def test_duckdb_twin_matches(spark):
    rows = [(g, (i * 37) % 100 + (10**6 if i % 50 == 0 else 0))
            for g in (1, 2) for i in range(200)]
    rows += [(3, 5)]  # singleton: both cuts = the value, nothing clamps
    df = spark.createDataFrame(rows, "g int, v bigint")
    got = sorted(map(tuple, textops.winsorize(
        df, "v", ["g"], lo_m=50_000, hi_m=950_000).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = sorted(map(tuple, con.execute(textops.winsorize_sql(
        "t", "v", ["g"], lo_m=50_000, hi_m=950_000)).fetchall()))
    assert got == want
    assert got[2][1] == 1 and got[2][4] == 0 and got[2][5] == 0

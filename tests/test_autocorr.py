"""Per-key lag-k autocorrelation (operators/temporal.py series_autocorr).

The temporal sibling of spatial.morans_i: N-scaled integer deviations,
one shared denominator (no sqrt), decimal(38)/HUGEINT ratio, NULL at
the genuine undefined cases.
"""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("acf-tests", master="local[4]",
                    shuffle_partitions=8)


def _rows():
    rows = []
    for t in range(50):
        rows.append((1, t, 10 if t % 2 == 0 else 0))   # period 2
    for t in range(50):
        rows.append((2, t, 7))                         # constant
    for t in range(50):
        rows.append((3, t, (t * 2654435761) % 97))     # hash noise
    for t in range(40):
        rows.append((4, t, t))                         # linear trend
    rows.append((5, 0, 3))                             # singleton
    rows += [(6, 0, 1), (6, 1, 5)]                     # n=2 (lag 2/3 empty)
    return rows


def test_planted_semantics(spark):
    df = spark.createDataFrame(_rows(), "k int, o bigint, v bigint")
    out = {(r.k, r.lag): r for r in temporal.series_autocorr(
        df, "k", "o", "v", lags=(1, 2, 3)).collect()}
    # alternating series: lag 1 strongly negative, lag 2 strongly
    # positive, |acf| < 1 (biased estimator shrinks toward 0 with lag)
    assert out[(1, 1)].acf_ppm < -900_000
    assert out[(1, 2)].acf_ppm > 900_000
    assert abs(out[(1, 3)].acf_ppm) < abs(out[(1, 1)].acf_ppm)
    # constant series: zero variance → NULL (genuinely undefined)
    for lag in (1, 2, 3):
        assert out[(2, lag)].acf_ppm is None and out[(2, lag)].den == 0
    # hash noise: near zero at every lag
    for lag in (1, 2, 3):
        assert abs(out[(3, lag)].acf_ppm) < 400_000
    # linear trend: high positive, monotonically decaying with lag
    assert out[(4, 1)].acf_ppm > out[(4, 2)].acf_ppm > out[(4, 3)].acf_ppm
    assert out[(4, 1)].acf_ppm > 900_000
    # singleton: no pairs, zero variance → NULL
    assert out[(5, 1)].acf_ppm is None
    # n=2 at lag 2: no pairs but positive variance → still NULL
    assert out[(6, 2)].n_pairs == 0 and out[(6, 2)].acf_ppm is None
    assert out[(6, 1)].n_pairs == 1


def test_every_key_lag_row_present(spark):
    """Keys emit one row per requested lag even when the series is
    shorter than the lag (n_pairs = 0, NULL acf) — downstream
    periodicity scans need the full (key × lag) frame."""
    df = spark.createDataFrame(_rows(), "k int, o bigint, v bigint")
    out = temporal.series_autocorr(df, "k", "o", "v", lags=(1, 2, 3))
    assert out.count() == 6 * 3


def test_duplicate_order_raises(spark):
    df = spark.createDataFrame(
        [(1, 5, 10), (1, 5, 20), (1, 6, 30)], "k int, o bigint, v bigint")
    with pytest.raises(Exception, match="duplicate order"):
        temporal.series_autocorr(df, "k", "o", "v").collect()


def test_lags_validated(spark):
    df = spark.createDataFrame([(1, 1, 1)], "k int, o int, v int")
    with pytest.raises(ValueError):
        temporal.series_autocorr(df, "k", "o", "v", lags=())
    with pytest.raises(ValueError):
        temporal.series_autocorr(df, "k", "o", "v", lags=(0,))


def test_duckdb_twin_matches(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "k int, o bigint, v bigint")
    got = sorted(map(tuple, temporal.series_autocorr(
        df, "k", "o", "v", lags=(1, 2, 3)).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k INT, o BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = sorted(map(tuple, con.execute(temporal.series_autocorr_sql(
        "t", "k", "o", "v", lags=(1, 2, 3))).fetchall()))
    assert got == want


def test_plan_one_key_shuffle_for_windows(spark):
    """All three series windows (row_number, n, S) must share ONE
    hashpartitioning on the key — at scale the windows are free once
    the series is co-located."""
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        (F.col("id") % 11).alias("k"),
        F.col("id").alias("o"),
        (F.col("id") * 17 % 101).alias("v"),
    )
    plan = temporal.series_autocorr(df, "k", "o", "v", lags=(1, 2)) \
        ._jdf.queryExecution().executedPlan().toString()
    # the deviation subtree: exactly one exchange feeds the window
    # stack (dup-guard window + series windows reuse it)
    n_window_exchanges = 0
    for line in plan.splitlines():
        if "Exchange hashpartitioning(k#" in line:
            n_window_exchanges += 1
    assert n_window_exchanges <= 2, plan

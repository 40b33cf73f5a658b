"""Mann-Kendall per-cell trend (spatial.tile_trend)."""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("trend-tests", master="local[4]",
                    shuffle_partitions=8)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "cell bigint, version int")


def test_monotone_series_classify(spark):
    rows = []
    # cell 1: rising 1,2,3,4 pages per bin → S = 6
    for b in range(1, 5):
        rows += [(1, b)] * b
    # cell 2: falling 4,3,2,1 → S = −6
    for b in range(1, 5):
        rows += [(2, b)] * (5 - b)
    # cell 3: constant 2 per bin → S = 0
    for b in range(1, 5):
        rows += [(3, b)] * 2
    out = {r.cell: r for r in spatial.tile_trend(
        _pages(spark, rows), n_bins=4).collect()}
    assert (out[1].s_stat, out[1].trend) == (6, "up")
    assert (out[2].s_stat, out[2].trend) == (-6, "down")
    assert (out[3].s_stat, out[3].trend) == (0, "flat")


def test_absent_bins_count_as_zero(spark):
    """A cell seen only in the last bin must read as RISING (0,0,0,c),
    not flat — the densification contract."""
    rows = [(9, 4)] * 5
    out = spatial.tile_trend(_pages(spark, rows), n_bins=4).collect()[0]
    assert out.s_stat == 3  # three (0 → 5) rising pairs; 0-0 pairs tie
    assert out.trend == "up"


def test_outlier_magnitude_is_ignored(spark):
    """Rank-based: one huge bin does not outweigh a falling tail."""
    rows = [(5, 1)] * 1000 + [(5, 2)] * 3 + [(5, 3)] * 2 + [(5, 4)] * 1
    out = spatial.tile_trend(_pages(spark, rows), n_bins=4).collect()[0]
    assert out.trend == "down"  # every pair falls: S = −6


def test_duckdb_twin_matches(spark):
    rows = [((i * 7) % 23, 1 + (i * 13) % 4) for i in range(500)]
    df = _pages(spark, rows)
    got = sorted(map(tuple, spatial.tile_trend(df, n_bins=4).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE src(cell BIGINT, version INT)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        spatial.tile_trend_sql("src", n_bins=4)).fetchall()))
    assert got == want


def test_n_bins_validated(spark):
    with pytest.raises(ValueError):
        spatial.tile_trend(_pages(spark, [(1, 1)]), n_bins=1)

"""Series gap-fill with forward carry (temporal.gap_fill) and the
space-time emerging-hotspot classification (spatial.emerging_hotspots)
— planted semantics, guard edges, Python mirror, DuckDB twin parity,
and composition consistency against the component operators."""

import datetime
import random

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import spatial, temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gapemerge-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime.datetime(2024, 1, 1)


def _canon(rows):
    return sorted(tuple("∅" if v is None else v for v in r) for r in rows)


def _con(rows, cols, name="t"):
    con = duckdb.connect()
    con.register(name, con.from_df(pd.DataFrame(rows, columns=cols)))
    return con


# ------------------------------------------------------------- gap_fill
def test_gap_fill_planted(spark):
    rows = [
        (1, T0, 1.00),                                   # bucket 473352
        (1, T0 + datetime.timedelta(hours=3), 2.50),     # gap of 2
        (1, T0 + datetime.timedelta(hours=3, minutes=5), 0.25),
        (2, T0 + datetime.timedelta(hours=1), 4.00),     # single bucket
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = {
        (r.user_id, r.bucket): (r.n_events, r.cents, r.cents_ffill, r.is_gap)
        for r in temporal.gap_fill(df).collect()
    }
    b0 = int(T0.timestamp() * 1_000_000) // 3_600_000_000
    assert got[(1, b0)] == (1, 100, 100, False)
    assert got[(1, b0 + 1)] == (0, None, 100, True)      # carried
    assert got[(1, b0 + 2)] == (0, None, 100, True)
    assert got[(1, b0 + 3)] == (2, 275, 275, False)      # two events summed
    assert got[(2, b0 + 1)] == (1, 400, 400, False)
    assert len(got) == 5  # key 1 dense span of 4 + key 2 single


def test_gap_fill_span_guard_fires(spark):
    rows = [
        (1, T0, 1.0),
        (1, T0 + datetime.timedelta(hours=50), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    with pytest.raises(Exception, match="gap_fill"):
        temporal.gap_fill(df, max_buckets=10).collect()
    con = _con(rows, ["user_id", "ts", "value"])
    with pytest.raises(Exception, match="gap_fill"):
        con.execute(temporal.gap_fill_sql("t", max_buckets=10)).fetchall()


def test_gap_fill_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        temporal.gap_fill(df, bucket_s=0)
    with pytest.raises(ValueError):
        temporal.gap_fill(df, max_buckets=0)


def test_gap_fill_twin_random(spark):
    rng = random.Random(4404)
    rows = [
        (
            rng.randrange(0, 5),
            T0 + datetime.timedelta(minutes=rng.randrange(0, 4000)),
            round(rng.uniform(0, 50), 2),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = _canon(temporal.gap_fill(df).collect())
    con = _con(rows, ["user_id", "ts", "value"])
    twin = _canon(con.execute(temporal.gap_fill_sql("t")).fetchall())
    assert got == twin
    # forward-fill mirror: per key the ffill equals the last observed
    per = {}
    for r in sorted(got):
        key, bucket, n, cents, ffill, gap = r
        if cents != "∅":
            per[key] = cents
        assert ffill == per[key]


# ---------------------------------------------------- emerging_hotspots
def _planted_points():
    rng = random.Random(4405)
    pts = []
    for _ in range(2500):
        pts.append(
            (rng.uniform(-8, 8), rng.uniform(-8, 8), rng.randrange(1, 5))
        )
    # intensifying hot blob: dense AND late-version-skewed
    for _ in range(1200):
        pts.append(
            (0.05 + rng.uniform(0, 0.15), 0.05 + rng.uniform(0, 0.15),
             rng.choice([3, 4, 4, 4]))
        )
    # persistent hot blob: dense, uniform versions
    for _ in range(1200):
        pts.append(
            (5.05 + rng.uniform(0, 0.15), 5.05 + rng.uniform(0, 0.15),
             rng.randrange(1, 5))
        )
    return pts


def _cells(spark, pts):
    sdf = spark.createDataFrame(pts, "lon double, lat double, version int")
    return sdf.selectExpr(
        "CAST(FLOOR((lat + 90.0) / 0.25) * 1440 "
        "+ FLOOR((lon + 180.0) / 0.25) AS BIGINT) AS cell",
        "version",
    )


def test_emerging_planted_labels(spark):
    pts = _planted_points()
    out = {
        r.cell: r
        for r in spatial.emerging_hotspots(_cells(spark, pts)).collect()
    }
    hot_blob = (90 // 1 * 0 + int((0.1 + 90) / 0.25) * 1440
                + int((0.1 + 180) / 0.25))
    pers_blob = (int((5.1 + 90) / 0.25) * 1440 + int((5.1 + 180) / 0.25))
    assert out[hot_blob].label == "intensifying-hot"
    assert out[pers_blob].hot and out[pers_blob].label in (
        "persistent-hot", "intensifying-hot", "diminishing-hot"
    )
    # structural separation, not threshold tuning: blob version skew
    # 3/4-only vs uniform — MK S must be positive at the hot blob
    assert out[hot_blob].s_stat >= 2
    labels = {r.label for r in out.values()}
    assert "none" in labels  # background cells classify quietly


def test_emerging_consistency_with_components(spark):
    pts = _planted_points()
    cells = _cells(spark, pts)
    out = spatial.emerging_hotspots(cells).collect()
    hs = {
        r.cell: (r.hot, r.cold)
        for r in spatial.tile_hotspots(
            cells.groupBy("cell").count()
            .withColumnRenamed("count", "n_pages"),
            "n_pages",
        ).collect()
    }
    tr = {
        r.cell: r.trend
        for r in spatial.tile_trend(cells, "version").collect()
    }
    for r in out:
        assert (r.hot, r.cold) == hs[r.cell]
        assert r.trend == tr[r.cell]
        spot = "hot" if r.hot else ("cold" if r.cold else "none")
        assert r.label == spatial.EMERGING_LABELS[(spot, r.trend)]


def test_emerging_twin_random(spark):
    pts = _planted_points()
    got = _canon(spatial.emerging_hotspots(_cells(spark, pts)).collect())
    con = _con(pts, ["lon", "lat", "version"], "pts")
    sql = (
        "WITH eh_src AS (SELECT "
        + spatial.grid_cell_sql("lon", "lat")
        + " AS cell, version FROM pts),"
        + spatial.emerging_hotspots_ctes("eh_src")
    )
    twin = _canon(con.execute(sql).fetchall())
    assert got == twin


def test_trend_ctes_final_cte_wrap_equivalent():
    """tile_trend_ctes(final_cte=...) must be the same query as the
    bare form — guard the rpartition wrapper."""
    con = duckdb.connect()
    rows = [(1, 1), (1, 3), (1, 4), (2, 2), (2, 1)]
    con.register("c", con.from_df(pd.DataFrame(rows, columns=["cell", "version"])))
    bare = con.execute(
        "WITH " + spatial.tile_trend_ctes("c")
    ).fetchall()
    wrapped = con.execute(
        "WITH " + spatial.tile_trend_ctes("c", final_cte="w")
        + " SELECT * FROM w"
    ).fetchall()
    assert sorted(bare) == sorted(wrapped)

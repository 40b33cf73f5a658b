"""Per-cell Gini diversity (spatial.cell_gini) and exponential-decay
rollup (temporal.decayed_rollup) — hand-computed plants + twin parity."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial, temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gini-decay-tests", master="local[4]",
                    shuffle_partitions=8)


def test_gini_monoculture_and_even_split(spark):
    rows = (
        [(10.1, 10.1, "en")] * 6                      # one cell, one lang
        + [(50.1, 50.1, "en")] * 3 + [(50.1, 50.1, "de")] * 3  # 50/50
        + [(-70.1, -30.1, "en"), (-70.1, -30.1, "de"),
           (-70.1, -30.1, "fr"), (-70.1, -30.1, "es")]  # 4-way even
    )
    sdf = spark.createDataFrame(rows, "lon double, lat double, lang string")
    got = {
        r.cell: (r.n_points, r.n_classes, r.gini_ppm)
        for r in spatial.cell_gini(sdf, "lang", res_deg=1.0).collect()
    }
    vals = sorted(got.values())
    assert (6, 1, 0) in vals                     # monoculture → 0
    assert (6, 2, 500_000) in vals               # even pair → 1/2
    assert (4, 4, 750_000) in vals               # 4-way even → 3/4


def test_gini_duckdb_twin(spark):
    rng = random.Random(5)
    rows = [
        (rng.uniform(-30, 30), rng.uniform(-30, 30),
         rng.choice(["en", "de", "fr"]))
        for _ in range(300)
    ]
    sdf = spark.createDataFrame(rows, "lon double, lat double, lang string")
    got = sorted(
        tuple(r)
        for r in spatial.cell_gini(sdf, "lang", res_deg=10.0).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (lon DOUBLE, lat DOUBLE, lang VARCHAR)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", rows)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            spatial.cell_gini_sql("pts", "lang", res_deg=10.0)
        ).fetchall()
    )
    assert got == twin


T0 = dt.datetime(2024, 6, 1)


def test_decay_halving_and_cutoff(spark):
    """An event one half-life old contributes exactly half the weight
    of a fresh one; an event past the 30-half-life cutoff contributes
    zero."""
    hl = 3600
    rows = [
        (1, T0, 2.0),                                   # fresh
        (1, T0 - dt.timedelta(seconds=hl), 2.0),        # 1 half-life
        (2, T0 - dt.timedelta(seconds=hl * 31), 99.0),  # beyond cutoff
        (2, T0, 0.0),                                   # anchors ref, 0 val
    ]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    got = {
        r.user_id: (r.n_events, r.score_q)
        for r in temporal.decayed_rollup(sdf, halflife_s=hl).collect()
    }
    full = 200 << temporal.DECAY_SHIFT
    assert got[1] == (2, full + full // 2)
    assert got[2] == (2, 0)


def test_decay_merge_property(spark):
    """score_q is a plain SUM → shard rollups merge by addition
    (computed against a shared reference epoch)."""
    hl = 3600
    rows = [
        (1, T0 - dt.timedelta(seconds=hl * i), float(i)) for i in range(8)
    ]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    whole = temporal.decayed_rollup(sdf, halflife_s=hl).collect()[0]
    # manual re-sum from per-event contributions
    want = sum(
        (i * 100) << (temporal.DECAY_SHIFT - i) for i in range(8)
    )
    assert whole.score_q == want


def test_decay_duckdb_twin(spark):
    rng = random.Random(10)
    rows = [
        (u, T0 - dt.timedelta(seconds=rng.randrange(0, 400000)),
         round(rng.uniform(0, 50), 2))
        for u in range(10)
        for _ in range(20)
    ]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    got = sorted(
        tuple(r)
        for r in temporal.decayed_rollup(sdf, halflife_s=7200).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            temporal.decayed_rollup_sql("ev", halflife_s=7200)
        ).fetchall()
    )
    assert got == twin

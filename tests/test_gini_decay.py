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


# ---------------------------------------------------------------------------
# slot_anomalies
# ---------------------------------------------------------------------------

def test_slot_anomaly_planted_spike_and_dip(spark):
    """Hour 9: ten calm days of 10 then a 60-event spike day.
    Hour 15: ten calm days of 10 then a 1-event dip day (its own slot
    — a spike in the population would inflate σ and mask the dip,
    which is exactly the population-convention semantics)."""
    rows = []
    for d in range(10):
        for h in (9, 15):
            base = dt.datetime(2024, 3, 1 + d, h, 0)
            rows += [(f"e{h}_{d}_{i}", base + dt.timedelta(minutes=i),
                      "view") for i in range(10)]
    spike_day = dt.datetime(2024, 3, 11, 9, 0)
    rows += [(f"s{i}", spike_day + dt.timedelta(minutes=i), "view")
             for i in range(60)]
    rows += [("d0", dt.datetime(2024, 3, 11, 15, 0), "view")]
    sdf = spark.createDataFrame(
        rows, "event_id string, ts timestamp, event_type string"
    )
    got = {
        (str(r.day), r.hour): (r.n, r.spike, r.dip)
        for r in temporal.slot_anomalies(sdf).collect()
    }
    assert got[("2024-03-11", 9)] == (60, True, False)
    assert got[("2024-03-11", 15)] == (1, False, True)
    assert got[("2024-03-01", 9)] == (10, False, False)


def test_slot_anomaly_uniform_slot_flags_nothing(spark):
    rows = [
        (f"e{d}_{i}", dt.datetime(2024, 3, 1 + d, 14, i), "click")
        for d in range(8) for i in range(5)
    ]
    sdf = spark.createDataFrame(
        rows, "event_id string, ts timestamp, event_type string"
    )
    out = temporal.slot_anomalies(sdf).collect()
    assert out and not any(r.spike or r.dip for r in out)


def test_slot_anomaly_duckdb_twin(spark):
    rng = random.Random(3)
    rows = [
        (f"e{k}",
         dt.datetime(2024, 4, 1) + dt.timedelta(
             days=rng.randrange(20), hours=rng.randrange(4),
             minutes=rng.randrange(60)),
         rng.choice(["view", "click"]))
        for k in range(2000)
    ]
    sdf = spark.createDataFrame(
        rows, "event_id string, ts timestamp, event_type string"
    )
    got = sorted(
        (r.event_type, str(r.day), r.hour, r.n, r.n_days, r.spike, r.dip)
        for r in temporal.slot_anomalies(sdf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev2 (event_id VARCHAR, ts TIMESTAMP, "
        "event_type VARCHAR)"
    )
    con.executemany("INSERT INTO ev2 VALUES (?, ?, ?)", rows)
    twin = sorted(
        (r[0], str(r[1]), r[2], r[3], r[4], r[5], r[6])
        for r in con.execute(
            temporal.slot_anomalies_sql("ev2")
        ).fetchall()
    )
    assert got == twin and any(r[5] for r in got)


# ---------------------------------------------------------------------------
# rolling_rollup
# ---------------------------------------------------------------------------

def test_rolling_gap_falls_out_of_frame(spark):
    """Days 0,1,2 then a jump to day 10: the trailing-7 window at day
    10 must contain ONLY day 10 (a ROWS frame would wrongly include
    the pre-gap days)."""
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, d0, 1.0), (1, d0 + dt.timedelta(days=1), 2.0),
        (1, d0 + dt.timedelta(days=2), 3.0),
        (1, d0 + dt.timedelta(days=10), 5.0),
    ]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    got = {
        r.day - 19723: (r.n_day, r.cents_day, r.n_win, r.cents_win)
        for r in temporal.rolling_rollup(sdf, window_days=7).collect()
    }
    assert got[0] == (1, 100, 1, 100)
    assert got[1] == (1, 200, 2, 300)
    assert got[2] == (1, 300, 3, 600)
    assert got[10] == (1, 500, 1, 500)     # gap: window is day 10 alone


def test_rolling_window_edge_inclusive(spark):
    """Exactly window_days-1 apart is IN the frame; window_days is out."""
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, d0, 1.0),
        (1, d0 + dt.timedelta(days=6), 1.0),
        (2, d0, 1.0),
        (2, d0 + dt.timedelta(days=7), 1.0),
    ]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.n_day, r.n_win)
        for r in temporal.rolling_rollup(sdf, window_days=7).collect()
    }
    assert (1, 1, 2) in got     # day 6 sees day 0
    assert (2, 1, 2) not in got  # day 7 does not


def test_rolling_duckdb_twin(spark):
    rng = random.Random(8)
    d0 = dt.datetime(2024, 2, 1)
    rows = [
        (u, d0 + dt.timedelta(days=rng.randrange(30),
                              hours=rng.randrange(24)),
         round(rng.uniform(0, 20), 2))
        for u in range(8) for _ in range(25)
    ]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    got = sorted(
        tuple(r)
        for r in temporal.rolling_rollup(sdf, window_days=5).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev3 (user_id BIGINT, ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany("INSERT INTO ev3 VALUES (?, ?, ?)", rows)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            temporal.rolling_rollup_sql("ev3", window_days=5)
        ).fetchall()
    )
    assert got == twin


# ---------------------------------------------------------------------------
# interval_coverage
# ---------------------------------------------------------------------------

def _coverage_python(rows):
    from collections import defaultdict

    per = defaultdict(list)
    for k, s, e in rows:
        per[k].append((s, e))
    out = {}
    for k, ivs in per.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        out[k] = (
            len(ivs), len(islands),
            sum(max(e - s, 0) for s, e in islands),
        )
    return out


def _run_cov(spark, rows):
    sdf = spark.createDataFrame(
        rows, "user_id bigint, start_us bigint, end_us bigint"
    )
    return {
        r.user_id: (r.n_intervals, r.n_islands, r.covered_us)
        for r in temporal.interval_coverage(sdf).collect()
    }


def test_coverage_merge_touch_disjoint(spark):
    rows = [
        (1, 0, 100), (1, 50, 150),     # overlap → one island, 150
        (1, 150, 200),                 # touching → still one island
        (1, 300, 400),                 # disjoint
        (2, 0, 0),                     # empty interval
    ]
    got = _run_cov(spark, rows)
    assert got[1] == (4, 2, 300)
    assert got[2] == (1, 1, 0)


def test_coverage_contained_interval(spark):
    """An interval fully inside another must not extend the island."""
    rows = [(1, 0, 1000), (1, 100, 200), (1, 900, 1100)]
    got = _run_cov(spark, rows)
    assert got[1] == (3, 1, 1100)


def test_coverage_random_vs_python_and_duckdb(spark):
    rng = random.Random(14)
    rows = [
        (u, s := rng.randrange(0, 10_000), s + rng.randrange(0, 800))
        for u in range(6)
        for _ in range(50)
    ]
    want = _coverage_python(rows)
    got = _run_cov(spark, rows)
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE iv (user_id BIGINT, start_us BIGINT, end_us BIGINT)"
    )
    con.executemany("INSERT INTO iv VALUES (?, ?, ?)", rows)
    twin = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            temporal.interval_coverage_sql("iv")
        ).fetchall()
    }
    assert twin == want

"""Peak interval concurrency (temporal.peak_overlap) — planted
half-open endpoint-tie cases, a plain-Python sweep mirror, empty
intervals, and DuckDB twin parity on random interval sets."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("peak-overlap-tests", master="local[4]",
                    shuffle_partitions=8)


def _python_peak(rows):
    """rows: (key, s, e) → {key: (n_intervals, peak, peak_at)}."""
    from collections import defaultdict

    byk = defaultdict(list)
    for k, s, e in rows:
        byk[k].append((s, e))
    out = {}
    for k, ivs in byk.items():
        net = defaultdict(int)
        for s, e in ivs:
            if e > s:
                net[s] += 1
                net[e] -= 1
        lvl, peak, peak_at = 0, 0, None
        for t in sorted(net):
            lvl += net[t]
            if lvl > peak:
                peak, peak_at = lvl, t
        out[k] = (len(ivs), peak, peak_at)
    return out


def _spark_peak(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, start_us long, end_us long"
    )
    got = temporal.peak_overlap(df).collect()
    return {
        r["user_id"]: (r["n_intervals"], r["peak"], r["peak_at_us"])
        for r in got
    }


def test_planted_peak(spark):
    """Three overlapping + one detached: peak 3 at the triple point."""
    rows = [(1, 0, 100), (1, 10, 50), (1, 20, 30), (1, 200, 300)]
    got = _spark_peak(spark, rows)
    assert got == {1: (4, 3, 20)}
    assert got == _python_peak(rows)


def test_half_open_endpoint_tie(spark):
    """[0,10) and [10,20) never overlap: peak 1, earliest at t=0."""
    rows = [(1, 0, 10), (1, 10, 20)]
    assert _spark_peak(spark, rows) == {1: (2, 1, 0)}


def test_end_and_start_same_instant_with_third(spark):
    """At t=10 one interval closes as another opens while a third is
    open: the level never exceeds 2 (ends apply first)."""
    rows = [(1, 0, 10), (1, 10, 20), (1, 5, 15)]
    got = _spark_peak(spark, rows)
    assert got == {1: (3, 2, 5)}
    assert got == _python_peak(rows)


def test_empty_intervals_counted_not_swept(spark):
    rows = [(1, 5, 5), (1, 9, 3)]
    assert _spark_peak(spark, rows) == {1: (2, 0, None)}
    rows2 = [(1, 5, 5), (1, 0, 10)]
    assert _spark_peak(spark, rows2) == {1: (2, 1, 0)}


def test_earliest_peak_instant(spark):
    """Peak reached twice → earliest instant reported."""
    rows = [(1, 0, 10), (1, 5, 10), (1, 20, 30), (1, 25, 30)]
    got = _spark_peak(spark, rows)
    assert got == {1: (4, 2, 5)}


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(31337)
    rows = []
    for _ in range(400):
        k = rng.randrange(6)
        s = rng.randrange(0, 1000)
        e = s + rng.randrange(-5, 80)
        rows.append((k, s, e))
    want = _python_peak(rows)
    assert _spark_peak(spark, rows) == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE iv (user_id BIGINT, start_us BIGINT, end_us BIGINT)"
    )
    con.executemany("INSERT INTO iv VALUES (?, ?, ?)", rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(temporal.peak_overlap_sql("iv")).fetchall()
    }
    assert got == want

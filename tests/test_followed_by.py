"""Windowed episode counts (temporal.followed_by_counts) — planted
within/beyond-window pairs, the strict-after rule, non-adjacent pairs
that event_transitions misses, the loud occupancy guard, and random
parity vs a plain-Python mirror and the DuckDB twin."""

import random
from datetime import datetime, timedelta

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("followed-by-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime(2024, 5, 1)
WIN = 600


def _spark_counts(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    out = temporal.followed_by_counts(df, WIN, **kw).collect()
    return {(r["from_type"], r["to_type"]): r["n_pairs"] for r in out}


def _python_counts(rows):
    out = {}
    for ua, ta, ea in rows:
        for ub, tb, eb in rows:
            if ua != ub:
                continue
            d = (tb - ta).total_seconds()
            if 0 < d <= WIN:
                out[(ea, eb)] = out.get((ea, eb), 0) + 1
    return out


def test_within_and_beyond_window(spark):
    rows = [
        (1, T0, "view"),
        (1, T0 + timedelta(seconds=WIN), "click"),       # exactly WIN: in
        (1, T0 + timedelta(seconds=2 * WIN - 10), "buy"),
        # buy is within WIN of the click but beyond WIN of the view
    ]
    got = _spark_counts(spark, rows)
    assert got[("view", "click")] == 1
    assert ("view", "buy") not in got
    assert got[("click", "buy")] == 1


def test_non_adjacent_counted(spark):
    """view → buy with a click in between: transitions would miss it,
    followed_by counts it."""
    rows = [
        (1, T0, "view"),
        (1, T0 + timedelta(seconds=10), "click"),
        (1, T0 + timedelta(seconds=20), "buy"),
    ]
    got = _spark_counts(spark, rows)
    assert got[("view", "buy")] == 1


def test_equal_time_excluded_and_cross_user(spark):
    rows = [
        (1, T0, "a"), (1, T0, "b"),          # equal time: no direction
        (2, T0 + timedelta(seconds=5), "b"),  # other user: never pairs
    ]
    got = _spark_counts(spark, rows)
    assert got == {}


def test_guard_fires(spark):
    rows = [(1, T0 + timedelta(seconds=i), "x") for i in range(30)]
    with pytest.raises(Exception, match="max_user_bucket"):
        _spark_counts(spark, rows, max_user_bucket=5)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(909)
    rows = [
        (
            rng.randrange(6),
            T0 + timedelta(seconds=rng.randrange(0, 4000)),
            rng.choice(["view", "click", "buy"]),
        )
        for _ in range(150)
    ]
    want = _python_counts(rows)
    got = _spark_counts(spark, rows)
    assert got == want and len(got) >= 6

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP, "
        "event_type VARCHAR)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    sql = temporal.followed_by_counts_sql("ev", WIN)
    twin = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    assert twin == want

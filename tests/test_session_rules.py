"""Session association rules (temporal.session_rules) — planted
baskets with hand-computed confidence/lift, the basket-size guard,
direction asymmetry, and DuckDB twin parity."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("rules-tests", master="local[4]",
                    shuffle_partitions=8)


def _ts(minute):
    return dt.datetime(2026, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def _spark(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = temporal.session_rules(df, **kw).collect()
    return {
        (r["antecedent"], r["consequent"]):
            (r["n_both"], r["n_ante"], r["conf_m"], r["lift_m"])
        for r in got
    }


def test_planted_rules(spark):
    """Three sessions: {a,b}, {a,b}, {a}.  N=3, n_a=3, n_b=2,
    n_ab=2: conf(a→b)=2/3, conf(b→a)=1, lift=3·2/(3·2)=1."""
    rows = [
        (1, _ts(0), "a"), (1, _ts(1), "b"),
        (1, _ts(100), "a"), (1, _ts(101), "b"),   # gap > 30min: new sess
        (2, _ts(0), "a"),
    ]
    got = _spark(spark, rows, min_support=2)
    assert got[("a", "b")] == (2, 3, 666_666, 1_000_000)
    assert got[("b", "a")] == (2, 2, 1_000_000, 1_000_000)


def test_lift_detects_association(spark):
    """x and y always co-occur while z floats free: lift(x→y) > 10⁶,
    lift(x→z) < 10⁶."""
    rows = []
    for s in range(4):
        rows += [(s, _ts(0), "x"), (s, _ts(1), "y")]
    rows += [(10, _ts(0), "z"), (11, _ts(0), "z"),
             (0, _ts(2), "z")]
    got = _spark(spark, rows, min_support=1)
    assert got[("x", "y")][3] > 1_000_000
    assert got[("x", "z")][3] < 1_000_000


def test_duplicate_events_one_item(spark):
    """Repeated same-type events in one session count once (distinct
    items — baskets, not streams)."""
    rows = [(1, _ts(0), "a"), (1, _ts(1), "a"), (1, _ts(2), "b")]
    got = _spark(spark, rows, min_support=1)
    assert got[("a", "b")] == (1, 1, 1_000_000, 1_000_000)


def test_basket_guard(spark):
    rows = [(1, _ts(i), f"t{i}") for i in range(10)]
    with pytest.raises(Exception, match="max_items_per_basket"):
        _spark(spark, rows, min_support=1, max_items_per_basket=4)


def test_duckdb_twin(spark):
    rng = random.Random(88)
    rows = []
    for u in range(12):
        m = 0
        for _ in range(rng.randrange(2, 20)):
            m += rng.choice([1, 2, 3, 60])
            rows.append((u, _ts(m), rng.choice(["a", "b", "c", "d"])))
    want = _spark(spark, rows, min_support=2)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (user_id BIGINT, ts TIMESTAMP,"
        " event_type VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?)", rows)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            temporal.session_rules_sql("e", min_support=2)
        ).fetchall()
    }
    assert got == want

"""Multi-touch attribution (temporal.attribution_credits) — planted
journeys with closed-form credit splits, mass conservation, lookback
and boundary semantics, Python mirror + DuckDB twin parity."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal

M = 1_000_000
T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("attribution-credit-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows, lookback_s=3600, conv="purchase"):
    df = spark.createDataFrame(
        [(i, _ts(s), u, t) for i, (u, s, t) in enumerate(rows)],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string",
    )
    out = temporal.attribution_credits(df, conv, lookback_s).collect()
    return {
        r.channel: (r.n_touches, r.n_conversions, r.first_ppm,
                    r.last_ppm, r.linear_ppm)
        for r in out
    }


def test_single_journey_three_models(spark):
    """view → click → view → purchase: first to the view, last to the
    second view, linear 10⁶ DIV 3 each with remainder to the last."""
    rows = [(1, 0, "view"), (1, 10, "click"), (1, 20, "view"),
            (1, 30, "purchase")]
    got = _run(spark, rows)
    third = M // 3
    assert got["view"] == (2, 1, M, M, third + (third + M - 3 * third))
    assert got["click"] == (1, 1, 0, 0, third)
    # mass conservation: exactly 10⁶ per model per conversion
    for idx in (2, 3, 4):
        assert sum(v[idx] for v in got.values()) == M


def test_lookback_drops_stale_touches(spark):
    rows = [(1, 0, "view"), (1, 5000, "click"), (1, 6000, "purchase")]
    got = _run(spark, rows, lookback_s=3600)
    assert "view" not in got        # 6000 s before conversion
    assert got["click"] == (1, 1, M, M, M)


def test_touch_credits_only_next_conversion(spark):
    """A touch between two conversions credits the second only; a
    touch after the last conversion credits nothing."""
    rows = [(1, 0, "view"), (1, 10, "purchase"), (1, 20, "click"),
            (1, 30, "purchase"), (1, 40, "view")]
    got = _run(spark, rows)
    assert got["view"] == (1, 1, M, M, M)     # only the ts=0 view
    assert got["click"] == (1, 1, M, M, M)


def test_conversion_with_no_touches_credits_nothing(spark):
    rows = [(1, 0, "purchase"), (2, 0, "view"), (2, 5, "purchase")]
    got = _run(spark, rows)
    assert got["view"] == (1, 1, M, M, M)
    assert sum(v[0] for v in got.values()) == 1


def test_users_isolated(spark):
    rows = [(1, 0, "view"), (2, 5, "purchase")]
    got = _run(spark, rows)
    assert got == {}


def _python_mirror(rows, lookback_s, conv):
    """rows: (event_id, user, sec, type)."""
    by_u = {}
    for eid, u, s, t in rows:
        by_u.setdefault(u, []).append((s * 1_000_000, eid, t))
    chan = {}
    for u, evs in by_u.items():
        evs.sort()
        groups = []
        cur = []
        for us, eid, t in evs:
            if t == conv:
                groups.append((us, cur))
                cur = []
            else:
                cur.append((us, eid, t))
        for conv_us, touches in groups:
            kept = [
                x for x in touches
                if conv_us - x[0] <= lookback_s * 1_000_000
            ]
            n = len(kept)
            if not n:
                continue
            for i, (us, eid, t) in enumerate(kept, start=1):
                c = chan.setdefault(t, [0, set(), 0, 0, 0])
                c[0] += 1
                c[1].add((u, conv_us))
                c[2] += M if i == 1 else 0
                c[3] += M if i == n else 0
                c[4] += (M // n) + (
                    M - n * (M // n) if i == n else 0
                )
    return {
        t: (v[0], len(v[1]), v[2], v[3], v[4])
        for t, v in chan.items()
    }


def test_random_matches_python_and_duckdb(spark):
    rng = random.Random(17)
    types = ["view", "click", "signup", "purchase"]
    rows = []
    eid = 0
    for u in range(20):
        s = 0
        for _ in range(rng.randrange(5, 30)):
            s += rng.randrange(1, 2000)
            rows.append((u, s, rng.choice(types)))
            eid += 1
    got = _run(spark, rows, lookback_s=3000)
    mirror_rows = [(i, u, s, t) for i, (u, s, t) in enumerate(rows)]
    want = _python_mirror(mirror_rows, 3000, "purchase")
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev(event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, ?, ?)",
        [(i, _ts(s), u, t) for i, (u, s, t) in enumerate(rows)],
    )
    got_sql = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            temporal.attribution_credits_sql(
                "ev", "purchase", 3000
            )
        ).fetchall()
    }
    assert got == got_sql


def test_lookback_validated(spark):
    with pytest.raises(ValueError):
        temporal.attribution_credits_sql("ev", "purchase", 0)

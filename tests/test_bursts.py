"""Kleinberg burst detection (temporal.kleinberg_bursts) — planted
burst recovered exactly, uniform stream stays flat, drop rules, loud
guard, switch-cost monotonicity, random ≡ exact integer mirror ≡
DuckDB unrolled-DP twin."""

import datetime
import random

import duckdb
import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException

from openstreetmap_license_change_spark.operators import temporal
from openstreetmap_license_change_spark.operators.temporal import LN2_PPM


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("bursts-tests", master="local[4]",
                    shuffle_partitions=8)


EPOCH = datetime.datetime(2024, 1, 1)


def _rows_from_gaps(key, gaps_ms):
    """Events at EPOCH + cumulative gaps (ms)."""
    t = 0
    rows = [(key, EPOCH)]
    for g in gaps_ms:
        t += g
        rows.append((key, EPOCH + datetime.timedelta(milliseconds=t)))
    return rows


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = temporal.kleinberg_bursts(df, "user_id", "ts", **kw).collect()
    got = {}
    for r in out:
        got.setdefault(r.user_id, {})[r.seq] = (r.gap_ms, r.state)
    return {
        k: [v[i] for i in sorted(v)] for k, v in got.items()
    }


def _mirror(rows, s_exp=1, switch_ppm=2 * LN2_PPM):
    s = 2 ** s_exp
    lns = s_exp * LN2_PPM
    by_key = {}
    for k, ts in rows:
        us = (ts - EPOCH) // datetime.timedelta(microseconds=1) + \
            1_704_067_200_000_000  # epoch µs of 2024-01-01 UTC
        by_key.setdefault(k, []).append(us)
    out = {}
    for k, us in by_key.items():
        us.sort()
        if len(us) < 3:
            continue
        gaps = [(us[i + 1] - us[i]) // 1000 for i in range(len(us) - 1)]
        m = len(gaps)
        tt = sum(gaps)
        if tt == 0:
            continue

        def e(q, g):
            return m * g * 10**6 if q == 0 \
                else s * m * g * 10**6 - tt * lns

        b = switch_ppm * tt
        dp = {0: (e(0, gaps[0]), [0]), 1: (b + e(1, gaps[0]), [1])}
        for i in range(1, m):
            nxt = {}
            for q in (0, 1):
                cost, p = min(
                    (dp[pp][0] + (b if pp == 0 and q == 1 else 0), pp)
                    for pp in (0, 1)
                )
                nxt[q] = (cost + e(q, gaps[i]), dp[p][1] + [q])
            dp = nxt
        _, st = min((dp[q][0], q) for q in (0, 1))
        out[k] = list(zip(gaps, dp[st][1]))
    return out


def test_planted_burst_recovered(spark):
    gaps = [10_000] * 10 + [10] * 6 + [10_000] * 10
    rows = _rows_from_gaps(1, gaps)
    got = _run(spark, rows)
    states = [st for _, st in got[1]]
    assert states == [0] * 10 + [1] * 6 + [0] * 10
    assert got == _mirror(rows)


def test_uniform_stream_never_bursts(spark):
    rows = _rows_from_gaps(7, [5_000] * 20)
    got = _run(spark, rows)
    assert [st for _, st in got[7]] == [0] * 20
    assert got == _mirror(rows)


def test_zero_switch_cost_is_per_gap_threshold(spark):
    # With B = 0 each gap picks its cheaper state independently:
    # state 1 iff (s-1)·m·g·1e6 < T·lns.
    gaps = [100, 9_000, 50, 9_000, 100]
    rows = _rows_from_gaps(3, gaps)
    got = _run(spark, rows, switch_ppm=0)
    m, tt = len(gaps), sum(gaps)
    expect = [
        1 if m * g * 10**6 < tt * LN2_PPM else 0 for g in gaps
    ]
    assert [st for _, st in got[3]] == expect
    assert got == _mirror(rows, switch_ppm=0)


def test_high_switch_cost_suppresses_burst(spark):
    gaps = [10_000] * 10 + [10] * 6 + [10_000] * 10
    rows = _rows_from_gaps(1, gaps)
    got = _run(spark, rows, switch_ppm=100 * LN2_PPM)
    assert [st for _, st in got[1]] == [0] * 26


def test_drop_rules(spark):
    rows = (
        _rows_from_gaps(1, [1_000])          # n=2: dropped
        + _rows_from_gaps(2, [0, 0])         # zero span: dropped
        + _rows_from_gaps(3, [1_000, 2_000])  # kept
    )
    got = _run(spark, rows)
    assert set(got) == {3}


def test_guard_fires(spark):
    rows = _rows_from_gaps(1, [100] * 10)
    with pytest.raises(SparkRuntimeException, match="max_events"):
        _run(spark, rows, max_events=8)


def test_param_validation(spark):
    df = spark.createDataFrame(
        _rows_from_gaps(1, [100] * 3), "user_id long, ts timestamp"
    )
    with pytest.raises(ValueError, match="s_exp"):
        temporal.kleinberg_bursts(df, s_exp=0)
    with pytest.raises(ValueError, match="switch_ppm"):
        temporal.kleinberg_bursts(df, switch_ppm=-1)
    with pytest.raises(ValueError, match="max_events"):
        temporal.kleinberg_bursts(df, max_events=2)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(4242)
    rows = []
    for k in range(25):
        gaps = []
        for _ in range(rng.randrange(2, 40)):
            gaps.append(
                rng.choice([rng.randrange(0, 50),
                            rng.randrange(2_000, 20_000)])
            )
        rows.extend(_rows_from_gaps(k, gaps))
    got = _run(spark, rows, s_exp=2, switch_ppm=LN2_PPM)
    assert got == _mirror(rows, s_exp=2, switch_ppm=LN2_PPM)

    con = duckdb.connect()
    con.execute("CREATE TABLE ev(user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?, ?)", rows)
    out = con.execute(temporal.kleinberg_bursts_sql(
        "ev", "user_id", "ts", s_exp=2, switch_ppm=LN2_PPM
    )).fetchall()
    twin = {}
    for k, seq, g, st in out:
        twin.setdefault(k, {})[seq] = (g, st)
    twin = {k: [v[i] for i in sorted(v)] for k, v in twin.items()}
    assert twin == got

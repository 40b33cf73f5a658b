"""Time-weighted average (temporal.time_weighted_avg) — the
irregular-sampling counterexample where AVG lies, LOCF semantics,
duplicate-timestamp determinism, negative TWA sign decomposition,
single-point NULL, random ≡ Python mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("twa-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, pts):
    df = spark.createDataFrame(
        pts, "k string, t long, v long"
    )
    out = temporal.time_weighted_avg(df, "k", "t", "v").collect()
    return {r.k: (r.n, r.t_span_us, r.v_last, r.twa_q) for r in out}


def _mirror(pts):
    byk = {}
    for k, t, v in pts:
        byk.setdefault(k, []).append((t, v))
    out = {}
    for k, rows in byk.items():
        rows.sort()
        n = len(rows)
        span = rows[-1][0] - rows[0][0]
        wsum = sum(
            v * (rows[i + 1][0] - t)
            for i, (t, v) in enumerate(rows[:-1])
        )
        if span == 0:
            twa = None
        else:
            q = abs(wsum) // span
            twa = -q if wsum < 0 else q
        out[k] = (n, span, rows[-1][1], twa)
    return out


def test_irregular_sampling_beats_avg(spark):
    # value 100 held for 90 µs, then value 0 sampled 9× in 10 µs:
    # row-AVG = 10, TWA = (100·90 + 0·…)/100 = 90
    pts = [("s", 0, 100)] + [("s", 90 + i, 0) for i in range(11)]
    got = _run(spark, pts)
    assert got["s"][3] == 90


def test_locf_exact(spark):
    # 10 for [0,4), 20 for [4,10): (40+120)/10 = 16
    pts = [("k", 0, 10), ("k", 4, 20), ("k", 10, 30)]
    got = _run(spark, pts)
    assert got["k"] == (3, 10, 30, 16)


def test_duplicate_timestamps_zero_duration(spark):
    # two readings at t=5: the (t, v)-earlier one holds for 0 µs
    pts = [("d", 0, 2), ("d", 5, 100), ("d", 5, 4), ("d", 10, 4)]
    got = _run(spark, pts)
    # 2·5 + 4·0 + 100·5 = 510 over span 10 → 51; last by (t, v) is
    # the t=10 reading
    assert got["d"] == (4, 10, 4, 51)


def test_negative_twa_truncates_toward_zero(spark):
    pts = [("n", 0, -5), ("n", 3, 0)]
    # wsum = −15, span 3 → −5 ; and a fractional case:
    pts += [("m", 0, -1), ("m", 2, 0), ("m", 3, 0)]
    # wsum = −2, span 3 → trunc(−2/3) = 0 (not −1)
    got = _run(spark, pts)
    assert got["n"][3] == -5
    assert got["m"][3] == 0


def test_single_reading_null(spark):
    got = _run(spark, [("one", 7, 42)])
    assert got["one"] == (1, 0, 42, None)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(404)
    pts = []
    for k in range(10):
        for _ in range(rng.randrange(1, 60)):
            pts.append(
                (f"k{k}", rng.randrange(0, 10**9),
                 rng.randrange(-500, 500))
            )
    got = _run(spark, pts)
    assert got == _mirror(pts)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", pts)
    rows = con.execute(
        temporal.time_weighted_avg_sql("t", "k", "t", "v")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got


def test_one_key_shuffle_plan(spark):
    pts = [("a", i, i) for i in range(10)]
    df = spark.createDataFrame(pts, "k string, t long, v long")
    plan = temporal.time_weighted_avg(df, "k", "t", "v")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1

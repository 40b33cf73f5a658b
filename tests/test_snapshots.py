"""Corpus snapshot diff (operators/snapshots.py): status semantics on
planted histories, DuckDB-twin parity, and the one-shuffle plan."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import snapshots as S


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("snapshot-tests", master="local[4]",
                    shuffle_partitions=8)


DDL = ("url string, warc_epoch bigint, version int, lon double, "
       "lat double, visible boolean")

PLANTED = [
    # changed: visible at both cutoffs, moved between them
    ("moved", 100, 1, 1.0, 1.0, True), ("moved", 200, 2, 2.0, 2.0, True),
    # unchanged: second capture after cutoff B
    ("same", 100, 1, 3.0, 3.0, True), ("same", 900, 2, 9.0, 9.0, True),
    # removed: latest at B is invisible
    ("gone", 100, 1, 4.0, 4.0, True), ("gone", 200, 2, 4.0, 4.0, False),
    # added: first capture after cutoff A
    ("new", 200, 1, 5.0, 5.0, True),
    # added (re-added): invisible at A, visible again at B
    ("back", 50, 1, 6.0, 6.0, False), ("back", 200, 2, 6.5, 6.5, True),
    # absent both: invisible at A, still invisible at B — dropped
    ("never", 50, 1, 7.0, 7.0, False),
    # unchanged with a same-position recapture between cutoffs
    ("recap", 100, 1, 8.0, 8.0, True), ("recap", 200, 2, 8.0, 8.0, True),
]


def test_planted_statuses(spark):
    df = spark.createDataFrame(PLANTED, DDL)
    rows = {r.url: r for r in S.snapshot_diff(df, 150, 400).collect()}
    assert {u: r.status for u, r in rows.items()} == {
        "moved": "changed", "same": "unchanged", "gone": "removed",
        "new": "added", "back": "added", "recap": "unchanged",
    }
    assert rows["moved"].old_version == 1
    assert rows["moved"].new_version == 2
    assert rows["new"].old_lon is None and rows["new"].new_lon == 5.0
    assert rows["gone"].new_version is None
    # re-added carries NO old state: the url was not part of snapshot A
    assert rows["back"].old_version is None


def test_epoch_order_validated(spark):
    df = spark.createDataFrame(PLANTED, DDL)
    with pytest.raises(ValueError):
        S.snapshot_diff(df, 400, 150)


def test_duckdb_twin_matches(spark):
    rng = random.Random(11)
    rows = []
    for u in range(300):
        for v in range(1, rng.randint(2, 5)):
            # epochs straddle the cutoffs WITHIN a url (v1 before A,
            # later captures between/after) so every status can occur
            rows.append((
                f"u{u}", v * 5000 + u * 13, v,
                round(rng.uniform(-180, 180), 4),
                round(rng.uniform(-90, 90), 4),
                rng.random() > 0.25,
            ))
    df = spark.createDataFrame(rows, DDL)
    a, b = 9_000, 30_000
    got = sorted(map(tuple, S.snapshot_diff(df, a, b).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t({DDL.replace(' string', ' VARCHAR')})")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", rows)
    want = sorted(map(tuple, con.execute(
        S.snapshot_diff_sql("t", a, b)).fetchall()))
    assert got == want
    statuses = {r[1] for r in got}
    assert statuses == {"added", "removed", "changed", "unchanged"}


def test_single_shuffle_plan(spark):
    """The scale claim: both snapshot states from ONE hash aggregation
    — exactly one exchange, partial aggregation map-side, no join."""
    df = spark.createDataFrame(PLANTED, DDL)
    plan = (
        S.snapshot_diff(df, 150, 400)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    # struct-typed max buffers aren't hash-aggregable, so the agg
    # plans as SortAggregate — what matters is partial + final around
    # the single exchange (map-side combine retained)
    assert plan.count("SortAggregate") == 2, plan

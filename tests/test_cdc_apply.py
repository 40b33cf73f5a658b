"""CDC compaction (snapshots.cdc_apply) — upsert/delete precedence by
log position, base pass-through, re-insert after delete, the
duplicate-seq loud failure, and DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import snapshots


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("cdc-tests", master="local[4]",
                    shuffle_partitions=8)


def _spark(spark, base, changes):
    b = spark.createDataFrame(
        base, "url string, lon double, lat double, visible boolean"
    )
    c = spark.createDataFrame(
        changes,
        "url string, seq long, op string, lon double, lat double,"
        " visible boolean",
    )
    rows = snapshots.cdc_apply(b, c).collect()
    return {r["url"]: (r["lon"], r["lat"], r["visible"]) for r in rows}


def test_upsert_delete_insert_semantics(spark):
    base = [("a", 1.0, 1.0, True), ("b", 2.0, 2.0, True),
            ("c", 3.0, 3.0, True)]
    changes = [
        ("a", 5, "upsert", 9.0, 9.0, True),    # update a
        ("b", 3, "delete", None, None, None),  # remove b
        ("d", 7, "upsert", 4.0, 4.0, True),    # insert new key
    ]
    got = _spark(spark, base, changes)
    assert got == {
        "a": (9.0, 9.0, True),
        "c": (3.0, 3.0, True),          # untouched base passes through
        "d": (4.0, 4.0, True),
    }


def test_highest_seq_wins_and_reinsert(spark):
    base = [("x", 0.0, 0.0, True)]
    changes = [
        ("x", 1, "delete", None, None, None),
        ("x", 2, "upsert", 5.0, 5.0, True),    # re-insert after delete
        ("x", 3, "upsert", 6.0, 6.0, False),
    ]
    got = _spark(spark, base, changes)
    assert got == {"x": (6.0, 6.0, False)}
    # delete last → key gone
    got2 = _spark(spark, base, changes + [("x", 9, "delete",
                                           None, None, None)])
    assert got2 == {}


def test_duplicate_seq_fails_loud(spark):
    base = [("x", 0.0, 0.0, True)]
    changes = [
        ("x", 2, "upsert", 1.0, 1.0, True),
        ("x", 2, "upsert", 2.0, 2.0, True),
    ]
    with pytest.raises(Exception, match="duplicate seq"):
        _spark(spark, base, changes)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(838)
    base = [(f"k{i}", float(i), float(-i), True) for i in range(30)]
    changes = []
    seq = 0
    for _ in range(120):
        seq += 1
        k = f"k{rng.randrange(45)}"
        if rng.random() < 0.25:
            changes.append((k, seq, "delete", None, None, None))
        else:
            changes.append((k, seq, "upsert",
                            float(rng.randrange(100)),
                            float(rng.randrange(100)),
                            rng.random() < 0.9))
    # python mirror
    state = {k: (lon, lat, vis) for k, lon, lat, vis in base}
    for k, s, op, lon, lat, vis in sorted(changes, key=lambda r: r[1]):
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = (lon, lat, vis)
    assert _spark(spark, base, changes) == state

    con = duckdb.connect()
    con.execute("CREATE TABLE b (url VARCHAR, lon DOUBLE, lat DOUBLE,"
                " visible BOOLEAN)")
    con.execute("CREATE TABLE c (url VARCHAR, seq BIGINT, op VARCHAR,"
                " lon DOUBLE, lat DOUBLE, visible BOOLEAN)")
    con.executemany("INSERT INTO b VALUES (?,?,?,?)", base)
    con.executemany("INSERT INTO c VALUES (?,?,?,?,?,?)", changes)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            snapshots.cdc_apply_sql("b", "c")
        ).fetchall()
    }
    assert got == state

"""SCD2 history table (snapshots.scd2_history) — collapse of
unchanged recrawls, half-open validity chains, null-safe change
detection, a plain-Python mirror, and DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import snapshots


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("scd2-tests", master="local[4]",
                    shuffle_partitions=8)


ATTRS = ("lon", "lat", "visible")


def _python(rows):
    """rows: (url, ts, lon, lat, visible) → list of interval dicts."""
    by_key = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    out = []
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r[1])
        ivs = []
        for r in vs:
            state = r[2:]
            if ivs and ivs[-1]["state"] == state:
                ivs[-1]["n"] += 1
            else:
                ivs.append({"state": state, "from": r[1], "n": 1})
        for i, iv in enumerate(ivs):
            nxt = ivs[i + 1]["from"] if i + 1 < len(ivs) else None
            out.append((k, *iv["state"], iv["from"], nxt, iv["n"],
                        nxt is None))
    return sorted(out, key=lambda r: (r[0], r[4]))


def _spark(spark, rows):
    df = spark.createDataFrame(
        rows,
        "url string, warc_epoch long, lon double, lat double,"
        " visible boolean",
    )
    got = snapshots.scd2_history(df).collect()
    return sorted(
        (
            (r["url"], r["lon"], r["lat"], r["visible"], r["valid_from"],
             r["valid_to"], r["n_versions"], r["is_current"])
            for r in got
        ),
        key=lambda r: (r[0], r[4]),
    )


def test_unchanged_recrawls_collapse(spark):
    rows = [
        ("u", 100, 1.0, 2.0, True),
        ("u", 200, 1.0, 2.0, True),   # no change — collapses
        ("u", 300, 1.5, 2.0, True),   # moved
        ("u", 400, 1.5, 2.0, False),  # hidden
    ]
    got = _spark(spark, rows)
    assert got == [
        ("u", 1.0, 2.0, True, 100, 300, 2, False),
        ("u", 1.5, 2.0, True, 300, 400, 1, False),
        ("u", 1.5, 2.0, False, 400, None, 1, True),
    ]


def test_reverted_state_reopens_interval(spark):
    """A→B→A yields THREE intervals (SCD2 is consecutive-change,
    not distinct-state)."""
    rows = [
        ("u", 1, 1.0, 1.0, True),
        ("u", 2, 9.0, 9.0, True),
        ("u", 3, 1.0, 1.0, True),
    ]
    got = _spark(spark, rows)
    assert len(got) == 3
    assert got == _python(rows)


def test_null_attrs_compare_equal(spark):
    rows = [
        ("u", 1, None, None, True),
        ("u", 2, None, None, True),   # NULL == NULL: collapses
        ("u", 3, 5.0, None, True),    # NULL → value: change
    ]
    got = _spark(spark, rows)
    assert got == [
        ("u", None, None, True, 1, 3, 2, False),
        ("u", 5.0, None, True, 3, None, 1, True),
    ]


def test_single_version_current(spark):
    got = _spark(spark, [("u", 7, 0.0, 0.0, True)])
    assert got == [("u", 0.0, 0.0, True, 7, None, 1, True)]


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(555)
    rows = []
    for k in range(25):
        ts = 0
        for _ in range(rng.randrange(1, 12)):
            ts += rng.randrange(1, 100)
            rows.append((
                f"u{k}", ts,
                float(rng.randrange(3)), float(rng.randrange(2)),
                rng.random() < 0.8,
            ))
    want = _python(rows)
    assert _spark(spark, rows) == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v (url VARCHAR, warc_epoch BIGINT, lon DOUBLE,"
        " lat DOUBLE, visible BOOLEAN)"
    )
    con.executemany("INSERT INTO v VALUES (?,?,?,?,?)", rows)
    got = sorted(
        (tuple(r) for r in con.execute(
            snapshots.scd2_history_sql("v")
        ).fetchall()),
        key=lambda r: (r[0], r[4]),
    )
    assert got == want

"""Grid-stay stay-point detection (spatial.stay_points) — crafted
trajectories with known runs, dwell/min-points boundaries, revisit
runs kept separate, and DuckDB twin parity."""

import datetime as dt

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("stay-tests", master="local[4]", shuffle_partitions=8)


T0 = dt.datetime(2024, 1, 1)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _run(spark, rows, **kw):
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    kw.setdefault("min_duration_s", 1800)
    kw.setdefault("min_points", 2)
    return spatial.stay_points(sdf, "user_id", "ts", **kw).collect()


def test_basic_stay_then_move(spark):
    """40 min in one cell → a stay; a single passing point is not."""
    rows = [
        (1, _t(0), 10.0, 10.0),
        (1, _t(20), 10.01, 10.01),
        (1, _t(40), 10.02, 10.0),
        (1, _t(50), 50.0, 50.0),     # far away, single point
    ]
    out = _run(spark, rows)
    assert len(out) == 1
    s = out[0]
    assert s.stay_no == 1 and s.n_points == 3
    assert s.dwell_s == 2400
    assert s.enter_us == 1704067200000000


def test_dwell_boundary_inclusive(spark):
    """Exactly min_duration dwell is kept; one µs less would not be —
    30 min runs sit exactly at the 1800 s default."""
    rows = [
        (1, _t(0), 10.0, 10.0),
        (1, _t(30), 10.0, 10.0),
        (2, _t(0), 10.0, 10.0),
        (2, _t(29), 10.0, 10.0),
    ]
    out = _run(spark, rows)
    assert [r.user_id for r in out] == [1]


def test_revisit_counts_as_two_stays(spark):
    """Leave the cell and come back → two distinct stays, ordered."""
    rows = [
        (1, _t(0), 10.0, 10.0),
        (1, _t(40), 10.0, 10.0),
        (1, _t(50), 90.0, 40.0),
        (1, _t(60), 90.0, 40.0),
        (1, _t(100), 90.0, 40.0),
        (1, _t(110), 10.0, 10.0),
        (1, _t(160), 10.0, 10.0),
    ]
    out = sorted(_run(spark, rows), key=lambda r: r.stay_no)
    assert len(out) == 3
    assert [r.stay_no for r in out] == [1, 2, 3]
    assert out[0].cell == out[2].cell != out[1].cell


def test_min_points_rule(spark):
    """A 2-point run fails min_points=3 even with enough dwell."""
    rows = [(1, _t(0), 10.0, 10.0), (1, _t(60), 10.0, 10.0)]
    assert _run(spark, rows, min_points=3) == []


def test_centroid_udeg_exact(spark):
    """Centroid = integer mean of floor(coord·10⁶)."""
    rows = [
        (1, _t(0), 10.0, 10.0),
        (1, _t(40), 10.1, 10.2),
    ]
    out = _run(spark, rows)
    assert out[0].lat_udeg == (10_000_000 + 10_200_000) // 2
    assert out[0].lon_udeg == (10_000_000 + 10_100_000) // 2


def test_duckdb_twin_parity(spark):
    """Pseudo-random walk, several users: Spark == SQL twin."""
    rows = []
    for u in range(5):
        lon, lat = float(u * 3), float(-u * 2)
        for i in range(60):
            # deterministic drift with occasional jumps
            if (i * 7 + u) % 13 == 0:
                lon += 1.7
            lat += 0.004
            rows.append((u, _t(i * 11), round(lon, 6), round(lat, 6)))
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    got = sorted(
        tuple(r)
        for r in spatial.stay_points(
            sdf, "user_id", "ts", min_duration_s=600, min_points=2
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts (user_id BIGINT, ts TIMESTAMP, "
        "lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO pts VALUES (?, ?, ?, ?)", rows)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            spatial.stay_points_sql(
                "pts", "user_id", "ts", min_duration_s=600, min_points=2
            )
        ).fetchall()
    )
    assert got == twin and len(got) > 5


# ---------------------------------------------------------------------------
# trip_cell_paths
# ---------------------------------------------------------------------------

def test_paths_rle_semantics(spark):
    """A→A→B→A compresses to three runs with counts 2,1,1."""
    rows = [
        (1, _t(0), 10.0, 10.0),
        (1, _t(1), 10.1, 10.1),     # same 0.25° cell
        (1, _t(2), 90.0, 40.0),
        (1, _t(3), 10.0, 10.0),
    ]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    out = spatial.trip_cell_paths(sdf, "user_id", "ts").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_points == 4 and r.n_runs == 3
    parts = r.path.split(",")
    assert [p.split(":")[1] for p in parts] == ["2", "1", "1"]
    assert parts[0].split(":")[0] == parts[2].split(":")[0]


def test_paths_parked_device_single_run(spark):
    rows = [(1, _t(i), 10.0, 10.0) for i in range(50)]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    out = spatial.trip_cell_paths(sdf, "user_id", "ts").collect()
    assert out[0].n_runs == 1 and out[0].n_points == 50


def test_paths_duckdb_twin_parity(spark):
    rows = []
    for u in range(4):
        lon, lat = float(u), float(-u)
        for i in range(70):
            if (i + u) % 9 == 0:
                lon += 0.9
            lat += 0.02
            rows.append((u, _t(i * 5), round(lon, 6), round(lat, 6)))
    sdf = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, lon double, lat double"
    )
    got = sorted(
        tuple(r)
        for r in spatial.trip_cell_paths(sdf, "user_id", "ts").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts2 (user_id BIGINT, ts TIMESTAMP, "
        "lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO pts2 VALUES (?, ?, ?, ?)", rows)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            spatial.trip_cell_paths_sql("pts2", "user_id", "ts")
        ).fetchall()
    )
    assert got == twin and all(r[2] > 1 for r in got)

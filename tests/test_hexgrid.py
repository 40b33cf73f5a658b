"""Hex grid index (operators/hexgrid.py): cube-rounding correctness,
key round-trips, nearest-center (Voronoi) property, and exact DuckDB
SQL-twin parity."""

import math
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import hexgrid


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("hexgrid-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _pts(spark, n, seed, lo=-179.0, hi=179.0):
    rng = random.Random(seed)
    rows = [(i, rng.uniform(lo, hi), rng.uniform(-89.0, 89.0))
            for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "pid int, lon double, lat double"
    )


def test_assignment_is_nearest_center(spark):
    """Cube rounding == Voronoi of hex centers: the assigned hex's
    center is at least as close (planar) as all 6 neighbor centers."""
    size = 7.0
    rows, df = _pts(spark, 300, seed=1)
    q, r = hexgrid.hex_qr(F.col("lon"), F.col("lat"), size)
    out = df.select("pid", "lon", "lat", q.alias("q"), r.alias("r")).collect()
    s3 = math.sqrt(3.0)
    for row in out:
        def center(qq, rr):
            return (size * s3 * (qq + rr / 2.0), size * 1.5 * rr)

        cx, cy = center(row.q, row.r)
        d0 = (row.lon - cx) ** 2 + (row.lat - cy) ** 2
        # containment in circumradius
        assert d0 <= size * size + 1e-9, row
        for dq, dr in ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)):
            nx, ny = center(row.q + dq, row.r + dr)
            dn = (row.lon - nx) ** 2 + (row.lat - ny) ** 2
            assert d0 <= dn + 1e-9, (row, dq, dr)


def test_key_roundtrip_and_center_fixedpoint(spark):
    size = 3.0
    _, df = _pts(spark, 200, seed=2)
    keyed = df.select(
        "pid", "lon", "lat",
        hexgrid.hex_key(F.col("lon"), F.col("lat"), size).alias("k"),
    )
    uq, ur = hexgrid.hex_unkey(F.col("k"))
    q, r = hexgrid.hex_qr(F.col("lon"), F.col("lat"), size)
    bad = keyed.select(
        ((uq != q) | (ur != r)).alias("mismatch")
    ).where("mismatch").count()
    assert bad == 0
    # hex of a hex center is that hex
    clon, clat = hexgrid.hex_center(uq, ur, size)
    cq, cr = hexgrid.hex_qr(clon, clat, size)
    bad2 = keyed.select(
        ((cq != uq) | (cr != ur)).alias("m")
    ).where("m").count()
    assert bad2 == 0


def test_sql_twin_parity_exact(spark):
    """hex_key (Spark) and hex_key_sql (DuckDB) must agree on every
    point — the driver-oracle contract for every hex entry."""
    for size in (7.0, 2.5, 0.31):
        rows, df = _pts(spark, 500, seed=int(size * 10))
        got = {
            r.pid: r.k
            for r in df.select(
                "pid",
                hexgrid.hex_key(F.col("lon"), F.col("lat"), size).alias("k"),
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pts(pid INT, lon DOUBLE, lat DOUBLE)"
        )
        con.executemany("INSERT INTO pts VALUES (?, ?, ?)", rows)
        expr = hexgrid.hex_key_sql("lon", "lat", size)
        want = dict(con.execute(f"SELECT pid, {expr} FROM pts").fetchall())
        assert got == want, size


def test_rollup_counts(spark):
    df = spark.createDataFrame(
        [("u1", 0.1, 0.1, True), ("u2", 0.2, 0.2, False),
         ("u3", 0.15, 0.05, False), ("u4", 170.0, 80.0, True)],
        "url string, lon double, lat double, accepted boolean",
    )
    rows = hexgrid.hex_rollup(df, size_deg=5.0).collect()
    by_n = sorted((r.n_pages, r.n_tainted) for r in rows)
    assert by_n == [(1, 0), (3, 2)]
    for r in rows:
        # center decodes consistently with the members' hex
        assert r.hex_id == ((r.hex_q + (1 << 20)) * (1 << 21)
                            + (r.hex_r + (1 << 20)))


def test_neighbors_cover_boundary_points(spark):
    """A point jittered across a hex edge lands in one of the 6
    neighbors, never further."""
    size = 4.0
    rng = random.Random(9)
    rows = []
    for i in range(150):
        lon, lat = rng.uniform(-100, 100), rng.uniform(-60, 60)
        rows.append((i, lon, lat, lon + rng.uniform(-0.2, 0.2),
                     lat + rng.uniform(-0.2, 0.2)))
    df = spark.createDataFrame(
        rows, "pid int, lon double, lat double, jlon double, jlat double"
    )
    q0, r0 = hexgrid.hex_qr(F.col("lon"), F.col("lat"), size)
    q1, r1 = hexgrid.hex_qr(F.col("jlon"), F.col("jlat"), size)
    far = df.select(
        (F.greatest(
            F.abs(q1 - q0), F.abs(r1 - r0), F.abs((q1 + r1) - (q0 + r0))
        ) > 1).alias("far")
    ).where("far").count()
    assert far == 0

def test_focal_stats_exact(spark):
    """Hand-checked 7-cell focal on a tiny raster: two adjacent hexes
    + one far hex."""
    from pyspark.sql import Row
    K = lambda q, r: (q + (1 << 20)) * (1 << 21) + (r + (1 << 20))
    cells = spark.createDataFrame(
        [Row(hex_id=K(0, 0), n=10), Row(hex_id=K(1, 0), n=20),
         Row(hex_id=K(5, 5), n=7)],
        "hex_id long, n long",
    )
    rows = {r.hex_id: r for r in hexgrid.hex_focal_stats(cells, "n").collect()}
    assert rows[K(0, 0)].n_nbrs == 2 and rows[K(0, 0)].nbr_sum == 30
    assert rows[K(0, 0)].focal_mean_m == 15_000_000
    assert rows[K(1, 0)].n_nbrs == 2 and rows[K(1, 0)].nbr_sum == 30
    assert rows[K(5, 5)].n_nbrs == 1 and rows[K(5, 5)].nbr_sum == 7
    # support does not dilate
    assert set(rows) == {K(0, 0), K(1, 0), K(5, 5)}

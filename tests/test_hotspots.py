"""Getis-Ord Gi* hot/cold spots (spatial.tile_hotspots)."""

import math
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hotspot-tests", master="local[4]",
                    shuffle_partitions=8)


def _raster(spark, rows):
    return spark.createDataFrame(rows, "cell bigint, n_pages bigint")


def _block(r0, c0, h, w, v, cols=1440):
    return [((r0 + i) * cols + (c0 + j), v)
            for i in range(h) for j in range(w)]


def test_spike_is_hot_depression_is_cold(spark):
    # flat field of 1s with a 100× spike and a 0-valued sink inside
    rows = dict(_block(100, 100, 9, 9, 1))
    spike = (104 * 1440 + 104)
    sink = (100 * 1440 + 100)
    rows[spike] = 100
    rows[sink] = 0
    out = {r.cell: r for r in spatial.tile_hotspots(
        _raster(spark, list(rows.items())), "n_pages").collect()}
    assert out[spike].hot and not out[spike].cold
    # the spike's neighbors share its neighborhood sum — hot too
    assert out[spike - 1].hot
    # the far corner's neighborhood is flat + the sink: below the
    # (spike-inflated) mean but the deficit is within noise at z=2 —
    # so assert the SIGN discipline instead: no flat cell is hot
    flat = 108 * 1440 + 108
    assert not out[flat].hot
    assert out[flat].gi_num < 0  # below global mean (spike inflates it)


def test_cold_spot_detected(spark):
    # field of 9s with a 3×3 hole of 0s: the hole is a cold spot
    rows = dict(_block(200, 200, 11, 11, 9))
    for c, _ in _block(204, 204, 3, 3, 0):
        rows[c] = 0
    out = {r.cell: r for r in spatial.tile_hotspots(
        _raster(spark, list(rows.items())), "n_pages").collect()}
    center = 205 * 1440 + 205
    assert out[center].cold and not out[center].hot
    assert out[center].nbr_sum == 0


def test_uniform_field_has_no_flags(spark):
    rows = _block(50, 50, 6, 6, 7)
    out = spatial.tile_hotspots(_raster(spark, rows), "n_pages")
    flagged = out.where(F.col("hot") | F.col("cold")).count()
    assert flagged == 0  # X = 0 and every A = 0 on interior+edge mix?
    # not quite: edge cells have smaller n_nbrs but A = N·S_i − T·nᵢ =
    # 7·(N·nᵢ − N·nᵢ) = 0 exactly for a constant field — no flags ever


def test_single_cell_raster(spark):
    out = spatial.tile_hotspots(_raster(spark, [(777, 5)]), "n_pages")
    r = out.collect()[0]
    assert not r.hot and not r.cold and r.gi_num == 0


def test_flags_match_float_zscore_reference(spark):
    """The integer inequality must agree with the textbook float Gi*
    formula wherever the float z is not razor-edge (planted data keeps
    it away from exactly 2.0)."""
    rng = random.Random(4)
    rows = [((300 + i) * 1440 + 300 + j, rng.randint(0, 6))
            for i in range(12) for j in range(12)]
    got = {r.cell: r for r in spatial.tile_hotspots(
        _raster(spark, rows), "n_pages").collect()}

    vals = dict(rows)
    n = len(vals)
    t = sum(vals.values())
    ss = sum(v * v for v in vals.values())
    mean = t / n
    s = math.sqrt(ss / n - mean * mean)
    for cell, v in vals.items():
        nb = [vals[c] for c in (
            cell + dy * 1440 + dx
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)) if c in vals]
        ni, si = len(nb), sum(nb)
        denom = s * math.sqrt((n * ni - ni * ni) / (n - 1))
        z = (si - mean * ni) / denom
        assert got[cell].hot == (z >= 2.0), (cell, z)
        assert got[cell].cold == (z <= -2.0), (cell, z)


def test_duckdb_twin_inequality(spark):
    """Engine parity of the wide-integer comparison itself on values
    big enough that int64 would overflow (A² ~ 10²⁸)."""
    rows = [(i, 10**9 + i * 12345) for i in range(20)]
    got = sorted(map(tuple, spatial.tile_hotspots(
        _raster(spark, rows), "n_pages").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE rollup(cell BIGINT, n_pages BIGINT)")
    con.executemany("INSERT INTO rollup VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute("""
        WITH fan AS (
            SELECT r.n_pages AS v,
                   (((r.cell // 1440) + d.dy) * 1440
                    + ((r.cell % 1440) + d.dx + 1440) % 1440) AS t_cell
            FROM rollup r CROSS JOIN (VALUES
                 (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                 (1,-1),(1,0),(1,1)) d(dy, dx)
            WHERE (r.cell // 1440) + d.dy >= 0
              AND (r.cell // 1440) + d.dy < 720
        ),
        agg AS (
            SELECT t_cell AS cell, COUNT(*) AS n_nbrs,
                   CAST(SUM(v) AS BIGINT) AS nbr_sum
            FROM fan GROUP BY 1
        ),
        tot AS (
            SELECT COUNT(*) AS n_cells,
                   CAST(SUM(n_pages) AS BIGINT) AS tot_v,
                   SUM(CAST(n_pages AS HUGEINT) * n_pages) AS tot_sq
            FROM rollup
        ),
        gi AS (
            SELECT r.cell, a.n_nbrs, a.nbr_sum,
                   CAST(t.n_cells AS HUGEINT) * a.nbr_sum
                     - CAST(t.tot_v AS HUGEINT) * a.n_nbrs AS A,
                   CAST(t.n_cells AS HUGEINT) * t.tot_sq
                     - CAST(t.tot_v AS HUGEINT) * t.tot_v AS X,
                   CAST(t.n_cells AS HUGEINT) * a.n_nbrs
                     - CAST(a.n_nbrs AS HUGEINT) * a.n_nbrs AS Y,
                   t.n_cells
            FROM rollup r JOIN agg a ON a.cell = r.cell CROSS JOIN tot t
        )
        SELECT cell, n_nbrs, nbr_sum, CAST(A AS BIGINT),
               (A > 0 AND A*A*(n_cells-1) >= 4*X*Y),
               (A < 0 AND A*A*(n_cells-1) >= 4*X*Y)
        FROM gi
    """).fetchall()))
    assert got == want

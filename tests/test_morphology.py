"""Raster morphology (spatial.tile_dilate / tile_erode)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("morph-tests", master="local[4]",
                    shuffle_partitions=8)


def _cells(spark, ids):
    return spark.createDataFrame([(c,) for c in ids], "cell bigint")


def _block(r0, c0, h, w, cols=1440):
    return [(r0 + i) * cols + c0 + j for i in range(h) for j in range(w)]


def test_dilate_of_single_cell_is_its_neighborhood(spark):
    c = 100 * 1440 + 100
    out = {r.cell: r.n_sources
           for r in spatial.tile_dilate(_cells(spark, [c])).collect()}
    want = {(100 + dy) * 1440 + 100 + dx
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)}
    assert set(out) == want
    assert all(v == 1 for v in out.values())


def test_erode_keeps_interior_only(spark):
    ids = _block(200, 200, 5, 5)
    got = {r.cell for r in spatial.tile_erode(_cells(spark, ids)).collect()}
    assert got == set(_block(201, 201, 3, 3))


def test_erode_then_dilate_opening_is_subset(spark):
    """Opening (erode→dilate) never grows beyond the input support —
    the defining morphology inequality."""
    rng = random.Random(3)
    ids = list({(rng.randrange(300, 320)) * 1440 + rng.randrange(300, 320)
                for _ in range(200)})
    support = set(ids)
    eroded = spatial.tile_erode(_cells(spark, ids))
    opened = {r.cell for r in spatial.tile_dilate(eroded).collect()}
    assert opened <= support


def test_pole_rows_have_smaller_neighborhoods(spark):
    """A 3×3 block touching lat row 0: its row-0 middle cell has only
    a 6-cell in-bounds neighborhood — fully occupied, so it erodes-
    survives, unlike a mid-grid edge cell."""
    ids = _block(0, 500, 3, 3)
    got = {r.cell for r in spatial.tile_erode(_cells(spark, ids)).collect()}
    assert 0 * 1440 + 501 in got     # pole-row middle survives
    assert 1 * 1440 + 501 in got     # true interior survives
    assert 0 * 1440 + 500 not in got  # corner does not


def test_duckdb_twin_matches(spark):
    rng = random.Random(9)
    ids = list({(rng.randrange(400, 430)) * 1440 + rng.randrange(400, 430)
                for _ in range(300)})
    df = _cells(spark, ids)
    con = duckdb.connect()
    con.execute("CREATE TABLE morph_src(cell BIGINT)")
    con.executemany("INSERT INTO morph_src VALUES (?)", [(c,) for c in ids])
    got_d = sorted(map(tuple, spatial.tile_dilate(df).collect()))
    want_d = sorted(map(tuple, con.execute(
        spatial.tile_morphology_sql("morph_src", "dilate")).fetchall()))
    assert got_d == want_d
    got_e = sorted(r.cell for r in spatial.tile_erode(df).collect())
    want_e = sorted(r[0] for r in con.execute(
        spatial.tile_morphology_sql("morph_src", "erode")).fetchall())
    assert got_e == want_e


def test_bad_args(spark):
    with pytest.raises(ValueError):
        spatial.tile_morphology_sql("t", "open")
    with pytest.raises(ValueError):
        spatial.tile_erode(_cells(spark, [1]), res_deg=180.0)

"""Kernel density smoothing (spatial.tile_kernel_density) and IDW
interpolation (spatial.idw_to_cells): hand-computed planted cases,
boundary renormalization, singularity capping, guard rails.
"""

import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("raster-interp-tests", master="local[4]",
                    shuffle_partitions=8)


def _kde(spark, cells, **kw):
    df = spark.createDataFrame(cells, "cell long, v long")
    out = spatial.tile_kernel_density(df, "v", **kw)
    return {r["cell"]: (r["wsum"], r["wnorm"], r["kde_m"]) for r in out.collect()}


def test_kde_single_cell_is_center_weight(spark):
    """One interior cell, radius 2: only the center tap lands on a
    support cell, weight C(4,2)² = 36."""
    # cell in the middle of the default grid (lat band 360, lon 720)
    c = 360 * 1440 + 720
    got = _kde(spark, [(c, 10)], radius=2)
    assert got == {c: (360, 36, 10_000_000)}  # 10·36 / 36 = 10 exactly


def test_kde_two_adjacent_cells_cross_contribute(spark):
    """Two horizontally adjacent cells: each receives its own center
    tap (36) plus the neighbor's dx=±1 tap (C(4,2)·C(4,3) = 24)."""
    c = 360 * 1440 + 720
    got = _kde(spark, [(c, 10), (c + 1, 0)], radius=2)
    # cell c: 10·36 (self) + 0·24 (neighbor) over wnorm 36+24
    assert got[c] == (360, 60, 6_000_000)
    # cell c+1: 10·24 + 0·36 over 60 -> 4.0
    assert got[c + 1] == (240, 60, 4_000_000)


def test_kde_pole_row_renormalizes(spark):
    """A support cell on the bottom lat band loses its dy<0 taps:
    wnorm shrinks to the taps that stayed on the grid."""
    c = 0 * 1440 + 720  # lat band 0
    got = _kde(spark, [(c, 7)], radius=2)
    wsum, wnorm, kde_m = got[c]
    assert wnorm == 36 and wsum == 7 * 36
    assert kde_m == 7_000_000


def test_kde_coarse_grid_raises(spark):
    df = spark.createDataFrame([(0, 1)], "cell long, v long")
    with pytest.raises(ValueError, match="too coarse"):
        spatial.tile_kernel_density(df, "v", radius=2, res_deg=90.0)


def _idw(spark, pts, **kw):
    df = spark.createDataFrame(pts, "lon double, lat double, value double")
    out = spatial.idw_to_cells(df, "value", **kw)
    return {r["cell"]: r for r in out.collect()}


def test_idw_single_sample_returns_its_value(spark):
    got = _idw(spark, [(1.0, 1.0, 42.0)], res_deg=2.0,
               weight_scale=2_000_000_000)
    assert len(got) == 1
    (row,) = got.values()
    assert row["n_samples"] == 1
    assert row["idw"] == pytest.approx(42.0, abs=1e-9)


def test_idw_closer_sample_dominates(spark):
    """Two samples in one cell: the one nearer the center gets the
    larger quantized 1/d² weight."""
    # res 2: cell center of cell containing lon/lat (1,1) is (1.0, 1.0)
    got = _idw(
        spark,
        [(1.0001, 1.0, 100.0), (1.9, 1.9, 0.0)],
        res_deg=2.0, weight_scale=2_000_000_000,
    )
    (row,) = got.values()
    assert row["n_samples"] == 2
    assert row["idw"] > 99.0  # near-center sample dominates


def test_idw_neighbor_cell_samples_contribute(spark):
    """A sample in an adjacent cell is part of the 3×3 probe."""
    got = _idw(
        spark,
        [(1.0, 1.0, 10.0), (3.0, 1.0, 30.0)],  # cells differ in lon band
        res_deg=2.0, weight_scale=2_000_000_000,
    )
    assert len(got) == 2
    for row in got.values():
        assert row["n_samples"] == 2


def test_idw_center_singularity_is_capped(spark):
    """A sample exactly on the cell center hits min_d2, not a div0."""
    got = _idw(spark, [(1.0, 1.0, 5.0), (1.0002, 1.0, 5.0)],
               res_deg=2.0, weight_scale=2_000_000_000)
    (row,) = got.values()
    assert row["idw"] == pytest.approx(5.0, abs=1e-9)


def test_idw_weight_scale_guard(spark):
    df = spark.createDataFrame([(0.0, 0.0, 1.0)],
                               "lon double, lat double, value double")
    with pytest.raises(ValueError, match="weight_scale"):
        spatial.idw_to_cells(df, "value", res_deg=2.0, weight_scale=1000)

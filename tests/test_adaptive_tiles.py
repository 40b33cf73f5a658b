"""Adaptive quadtree tiling (spatial.adaptive_tiles) — partition
invariant, planted-hotspot refinement, max-res overflow leaves, and
DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("adaptive-tests", master="local[4]",
                    shuffle_partitions=8)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "lon double, lat double")


def _mixed_rows():
    """60 points packed into a tiny urban square + 40 spread over an
    ocean-sized quadrant."""
    rng = random.Random(9)
    dense = [
        (10.0 + rng.random() * 0.01, 10.0 + rng.random() * 0.01)
        for _ in range(60)
    ]
    sparse = [
        (-170.0 + rng.random() * 80, -80.0 + rng.random() * 70)
        for _ in range(40)
    ]
    return dense + sparse


def test_partition_invariant(spark):
    """Leaves exactly partition the input: counts sum to n, and no
    point is double-assigned (leaf cells are never ancestors of each
    other — checked via Morton-prefix containment)."""
    rows = _mixed_rows()
    out = spatial.adaptive_tiles(
        _pts(spark, rows), min_res=1, max_res=6, max_count=10
    ).collect()
    assert sum(r.n_points for r in out) == len(rows)
    ids = [(r.cell & ((1 << 36) - 1), r.res) for r in out]
    for i, (m1, r1) in enumerate(ids):
        for m2, r2 in ids[i + 1:]:
            if r1 == r2:
                assert m1 != m2
            else:
                (ms, rs), (mf, rf) = sorted(
                    [(m1, r1), (m2, r2)], key=lambda t: t[1]
                )
                assert (mf >> (2 * (rf - rs))) != ms


def test_hotspot_refines_sparse_stays_coarse(spark):
    """The dense square splits to deep leaves; ocean cells settle at
    the first level they fall under threshold."""
    out = spatial.adaptive_tiles(
        _pts(spark, _mixed_rows()), min_res=1, max_res=8, max_count=10
    ).collect()
    res_of_dense = [r.res for r in out if r.n_points > 0 and r.res >= 5]
    res_sparse = [r.res for r in out if r.res <= 3]
    assert res_of_dense, "dense cluster should refine past res 4"
    assert res_sparse, "sparse quadrant should settle coarse"


def test_max_res_leaf_may_exceed_threshold(spark):
    """Coincident points cannot be split: the max_res leaf holds them
    all even though it exceeds max_count."""
    rows = [(42.0, 17.0)] * 25
    out = spatial.adaptive_tiles(
        _pts(spark, rows), min_res=2, max_res=4, max_count=5
    ).collect()
    assert len(out) == 1
    assert out[0].res == 4 and out[0].n_points == 25


def test_single_level_ladder(spark):
    """min_res == max_res degenerates to a plain fixed-res rollup."""
    rows = _mixed_rows()
    out = spatial.adaptive_tiles(
        _pts(spark, rows), min_res=3, max_res=3, max_count=1
    ).collect()
    assert sum(r.n_points for r in out) == len(rows)
    assert all(r.res == 3 for r in out)


def test_validation(spark):
    df = _pts(spark, [(0.0, 0.0)])
    with pytest.raises(ValueError):
        spatial.adaptive_tiles(df, min_res=5, max_res=3)
    with pytest.raises(ValueError):
        spatial.adaptive_tiles(df, max_res=99)
    with pytest.raises(ValueError):
        spatial.adaptive_tiles(df, max_count=0)


def test_duckdb_twin_parity(spark):
    rows = _mixed_rows()
    got = sorted(
        tuple(r)
        for r in spatial.adaptive_tiles(
            _pts(spark, rows), min_res=1, max_res=7, max_count=8
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", rows)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            spatial.adaptive_tiles_sql(
                "pts", min_res=1, max_res=7, max_count=8
            )
        ).fetchall()
    )
    assert got == twin

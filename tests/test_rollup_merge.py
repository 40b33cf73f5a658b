"""Mergeable incremental rollup (spatial.tile_rollup_merge)."""

import random

import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("rollupmerge-tests", master="local[4]",
                    shuffle_partitions=8)


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, "cell bigint, tainted boolean"
    )


def test_merge_equals_full_rollup(spark):
    rng = random.Random(1)
    rows = [(rng.randrange(50), rng.random() < 0.3) for _ in range(2000)]
    a, b = rows[:1200], rows[1200:]
    full = {r.cell: tuple(r) for r in spatial.tile_rollup(
        _cells(spark, rows)).collect()}
    merged = {r.cell: tuple(r) for r in spatial.tile_rollup_merge(
        spatial.tile_rollup(_cells(spark, a)),
        spatial.tile_rollup(_cells(spark, b)),
    ).collect()}
    assert merged == full


def test_density_is_rederived_not_averaged(spark):
    # base: 1 tainted of 1 page (density 1.0); delta: 0 of 3
    # (density 0.0); merged truth = 1/4, NOT the 0.5 density average
    base = spatial.tile_rollup(_cells(spark, [(7, True)]))
    delta = spatial.tile_rollup(
        _cells(spark, [(7, False), (7, False), (7, False)]))
    out = spatial.tile_rollup_merge(base, delta).collect()[0]
    assert (out.n_pages, out.n_tainted, out.taint_density) == (4, 1, 0.25)


def test_merge_is_aggregate_sized(spark):
    """The merge plan touches only the two aggregates: one exchange,
    no join, no window."""
    base = spatial.tile_rollup(_cells(spark, [(1, True)]))
    plan = (
        spatial.tile_rollup_merge(base, base)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Window" not in plan, plan

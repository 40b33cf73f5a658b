"""Spatial write-layout pass (spatial.cluster_by_cell) + descendant
range pruning algebra (spatial.cell_descendant_range)."""

import glob
import random

import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("layout-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _pts(spark, n=4000, seed=3):
    rng = random.Random(seed)
    rows = [(i, rng.uniform(-179.9, 179.9), rng.uniform(-89.9, 89.9))
            for i in range(n)]
    return spark.createDataFrame(rows, "pid int, lon double, lat double")


def test_plan_is_range_partition_local_sort(spark):
    df = spatial.cluster_by_cell(_pts(spark), res=12, num_partitions=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(cell" in plan, plan
    # local sort only — exactly one exchange (the range one)
    assert plan.count("Exchange") == 1, plan


def test_written_files_have_tight_disjoint_cell_ranges(spark, tmp_path):
    out = str(tmp_path / "clustered")
    spatial.cluster_by_cell(_pts(spark), res=12, num_partitions=8) \
        .write.parquet(out)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 4
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("cell"), F.max("cell")).collect()[0]
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file cell ranges overlap — no pruning value"


def test_descendant_range_matches_enumeration(spark):
    rng = random.Random(1)
    for _ in range(50):
        res = rng.randint(0, 8)
        child = rng.randint(res, min(res + 4, 16))
        lon, lat = rng.uniform(-179, 179), rng.uniform(-89, 89)
        df = spark.range(1).select(
            spatial.hier_cell(F.lit(lon), F.lit(lat), res).alias("anc"),
            spatial.hier_cell(F.lit(lon), F.lit(lat), child).alias("dec"),
        )
        row = df.collect()[0]
        lo, hi = spatial.cell_descendant_range(row.anc, child)
        assert lo <= row.dec <= hi
        assert hi - lo + 1 == 4 ** (child - res)


def test_range_predicate_equals_bbox_filter(spark):
    """Pruning predicate built from covering ancestors selects exactly
    the points whose fine cell descends from them."""
    df = _pts(spark, n=2000, seed=8)
    fine = df.withColumn(
        "cell", spatial.hier_cell(F.col("lon"), F.col("lat"), 12)
    )
    anc = spatial.hier_cell(F.col("lon"), F.col("lat"), 4)
    some_cells = [r.a for r in fine.select(anc.alias("a")).distinct()
                  .orderBy("a").limit(3).collect()]
    pred = None
    for c in some_cells:
        lo, hi = spatial.cell_descendant_range(c, 12)
        p = (F.col("cell") >= lo) & (F.col("cell") <= hi)
        pred = p if pred is None else (pred | p)
    got = fine.where(pred).count()
    want = fine.where(anc.isin(some_cells)).count()
    assert got == want > 0


def test_bounds_raise(spark):
    cell = (4 << 36) | 7
    with pytest.raises(ValueError, match="child_res"):
        spatial.cell_descendant_range(cell, 3)
    with pytest.raises(ValueError, match="child_res"):
        spatial.cell_descendant_range(cell, 17)

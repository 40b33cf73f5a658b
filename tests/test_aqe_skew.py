"""AQE skew-join: the runtime half of the skew strategy.

`spatial.salt_hot_cells` (operator-level, pre-shuffle) is tested in
test_spatial_scheduling.py; this file demonstrates the OTHER half the
architecture claims — Spark's adaptive skew-join splitting the hot
partition of a sort-merge join at runtime — by executing a planted-skew
join with the skew thresholds scaled down to test size and asserting
the FINAL adaptive plan actually took the skew-split path."""

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("aqe-skew-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def test_aqe_splits_planted_skew_join(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }
    try:
        # scale the skew thresholds to test size (prod defaults are
        # 256MB-shaped) and force a sort-merge join (at 100 TB both
        # sides are fact-sized)
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # hot cell 777: 40k rows vs ~40/cell elsewhere
        left = spark.range(0, 44_000).select(
            F.when(F.col("id") < 40_000, F.lit(777))
            .otherwise(F.col("id") % 100)
            .alias("cell"),
            F.concat(F.lit("padpadpadpadpadpad-"), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("cell"),
            F.concat(F.lit("dim-"), F.col("id")).alias("name"),
        ).unionByName(
            spark.createDataFrame([(777, "dim-777")], "cell bigint, name string")
        )
        joined = left.join(right, "cell")
        # collect() executes THIS DataFrame's own queryExecution (count()
        # would spawn a separate aggregate query and leave `joined`'s
        # adaptive plan unfinalized)
        n = len(joined.collect())
        assert n == 44_000  # every left row matches exactly once

        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead" in final_plan, final_plan
        assert "skewed" in final_plan, final_plan  # the hot partition split
    finally:
        for k, v in saved.items():
            conf.set(k, v)

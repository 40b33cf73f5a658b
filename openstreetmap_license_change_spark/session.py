"""SparkSession factory with scale-oriented defaults.

Defaults target the sandbox (local[N], 32 cores) but every setting is
the one we'd ship to a 1000-executor cluster: AQE on (runtime
re-planning + skew-join splitting), explicit shuffle partitions, Arrow
for every pandas-UDF boundary, and broadcast threshold sized for the
small dimension tables this engine uses (changesets/users/polygons).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osm-license-change-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # scale reduce-side parallelism with the cluster size (4 waves
        # per core), exactly as one would size it per-cluster in prod;
        # AQE coalesces small partitions back down at runtime
        default_sp = max(32, int(cpus) * 4) if cpus.isdigit() else 128
        shuffle_partitions = int(
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(default_sp))
        )

    # AQE default ON (runtime re-plan + skew-join splitting — the
    # 100-TB posture).  SPARK_GRAFT_AQE=false exists for the scaling
    # protocol: at 1-8 local cores AQE's between-stage re-planning is
    # pure driver-serial time (measured: knn 20.2 s → 14.0 s at
    # local[4]) that a real cluster amortizes across thousands of
    # tasks per stage.
    aqe = os.environ.get("SPARK_GRAFT_AQE", "true")

    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe)
        # let AQE rewrite a planned sort-merge join into a shuffled-hash
        # join at runtime when every post-shuffle build partition fits
        # (default 0 = off): the kNN/pair joins feed hash aggregates or
        # window group-limits, so SMJ's input sorts are pure waste; the
        # per-partition bound keeps it OOM-safe at any scale
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m",
        )
        # DisableUnnecessaryBucketedScan (autoBucketedScan, default on)
        # demotes a bucketed read to a plain merged-file scan whenever
        # no operator above it declares a hash-distribution requirement
        # Catalyst can see — which is exactly the fold's
        # sortWithinPartitions+mapInPandas plan.  That silently breaks
        # the url co-location contract assume_partitioned relies on
        # (histories split across partitions fold fragment-wise).  Keep
        # bucketed scans honest; the cost is that a bucketed scan's
        # parallelism is capped at the bucket count, which we size to
        # the cluster anyway (sources/bucketed.py).
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.local.dir", _local_dir())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _local_dir() -> str:
    """Shuffle/spill dir: prefer tmpfs — the sandbox host's disk is
    shared with noisy neighbors; a real cluster would use local NVMe."""
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        return shm
    except OSError:
        return "/tmp"

"""Bucketed staging for the url-keyed pipeline.

Every heavy stage of the engine shuffles on the same key (url): the
fold repartitions histories by url, latest_version aggregates by url,
candidate_filter semi-joins on url.  On a real deployment the pages
table is written ONCE bucketed by url (Iceberg bucket partition
transform / Hive bucketing), and every downstream stage then reads
pre-co-located data: Catalyst sees the bucket spec as a satisfied
hash-partitioning requirement and elides the Exchange entirely.

At 100 TB that converts the pipeline's dominant cost — N full-data
shuffles across stages and reruns — into one bucketed write amortized
over every subsequent query.  This module is the local-parquet
demonstration of that contract (``saveAsTable`` with ``bucketBy``);
``tests/test_bucketed.py`` asserts the Exchange actually disappears
for aggregation, self-join, and the fold's repartition feed.

Reference tie-in: the bulk loader's ``current_*`` tables
(extract_loader.rb:320-360) are exactly this — a keyed physical
layout maintained so per-element queries never rescan raw history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "url",
    buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    sorted within buckets) by ``key``.  Sorting by (key, version) also
    pre-orders the fold's input inside each bucket file."""
    sort_cols = [key] + (["version"] if "version" in df.columns else [])
    (
        df.write.bucketBy(buckets, key)
        .sortBy(*sort_cols)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucket metadata attached (a plain
    ``read.parquet`` of the same files would lose the bucket spec and
    reintroduce the shuffle)."""
    return spark.table(table)


def write_cell_partitioned(
    df: DataFrame, path: str, cell_col: str = "part_cell"
) -> None:
    """Persist spatially partitioned by a (coarse) cell column — the
    local analogue of an Iceberg partition transform over
    ``hier_cell``: a spatial predicate then PRUNES whole partitions at
    planning time (PartitionFilters in the scan), so a regional query
    over a planetary table reads only its region's files.

    The partition column should be COARSE (hier_cell res 2-4, ≤ ~1k
    distinct values): one directory per value — a fine cell id here
    would create millions of tiny files, which is what the separate
    bucket-by-url layout is for.  ``tests/test_bucketed.py`` asserts
    the pruning actually reaches the scan."""
    df.write.mode("overwrite").partitionBy(cell_col).parquet(path)

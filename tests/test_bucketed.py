"""Bucketed-staging plan tests: the url shuffle disappears for
aggregation and co-located self-join over a bucketed pages table."""

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pytest-bucketed", master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def bucketed_pages(spark, tmp_path_factory):
    from openstreetmap_license_change_spark.sources import bucketed, pages

    path = str(tmp_path_factory.mktemp("bucketed") / "pages_b")
    df = pages.pages_from_documents(spark, SF_DIR)
    bucketed.write_bucketed(df, "pages_bucketed", path, buckets=8)
    return bucketed.read_bucketed(spark, "pages_bucketed")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_agg_has_no_exchange(spark, bucketed_pages):
    from openstreetmap_license_change_spark.operators import lineage

    latest = lineage.latest_version(bucketed_pages)
    plan = _plan(latest)
    assert "Exchange" not in plan, plan
    # and it still computes the right thing
    n_urls = bucketed_pages.select("url").distinct().count()
    assert latest.count() == n_urls


def test_bucketed_self_join_has_no_exchange(spark, bucketed_pages):
    """With broadcast disabled (at 100 TB both sides are fact-sized),
    the equi-join on the bucket key is a sort-merge join over bucketed
    scans — zero Exchange on either side."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = bucketed_pages.select("url", "version")
        b = bucketed_pages.select(F.col("url"), F.col("changeset_id"))
        joined = a.join(b, "url")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_query_does_exchange(spark):
    """Control: the identical aggregation over the raw (unbucketed)
    source DOES shuffle — proving the bucket spec, not the data size,
    removed the Exchange above."""
    from openstreetmap_license_change_spark.operators import lineage
    from openstreetmap_license_change_spark.sources import pages

    df = pages.pages_from_documents(spark, SF_DIR)
    assert "Exchange" in _plan(lineage.latest_version(df))


def test_cell_partitioned_layout_prunes_at_scan(spark, tmp_path_factory):
    """Spatial partition pruning (the Iceberg partition-transform
    analogue): a cell predicate over a hier_cell-partitioned table
    appears in the scan's PartitionFilters and prunes to a strict
    subset of partitions — a regional query never reads the rest of
    the planet."""
    from openstreetmap_license_change_spark.operators import spatial
    from openstreetmap_license_change_spark.sources import bucketed, pages

    path = str(tmp_path_factory.mktemp("cellpart") / "pages_cp")
    df = pages.pages_from_documents(spark, SF_DIR).withColumn(
        "part_cell", spatial.hier_cell(F.col("lon"), F.col("lat"), 2)
    )
    n_cells = df.select("part_cell").distinct().count()
    assert n_cells > 1
    bucketed.write_cell_partitioned(df, path)

    one_cell = df.select("part_cell").first().part_cell
    q = (
        spark.read.parquet(path)
        .where(F.col("part_cell") == one_cell)
        .select("url", "lon", "lat")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert f"(part_cell#" in plan or "part_cell" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # correctness: exactly that cell's rows come back
    want = df.where(F.col("part_cell") == one_cell).count()
    assert q.count() == want

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

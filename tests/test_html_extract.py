"""The input-contract ``html:binary`` column and its Arrow-batched
extraction inverse (sources/pages.html_of ↔ textops.extract_text).

Per-row invariant (BASELINE input_hint): extracted text is
byte-identical to ``text`` per url/version.  Hostile inputs pin the
entity escape/unescape order; a plan test pins that queries which
never select ``html`` don't pay for it (Catalyst prunes the encode
expression), and that extraction runs Arrow-batched, not row-at-a-time.
"""

import pyspark.sql.functions as F
import pytest

from openstreetmap_license_change_spark.operators import textops
from openstreetmap_license_change_spark.sources import pages


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("html-extract-tests", master="local[4]",
                    shuffle_partitions=8)


def test_extract_is_byte_identical_per_version(spark):
    p = pages.pages_from_documents(spark, "/root/testdata/sf0.001")
    ext = textops.extract_text(p)
    bad = ext.where(
        F.col("extracted").isNull() | (F.col("extracted") != F.col("text"))
    ).count()
    assert bad == 0
    # and the invariant holds over EVERY version row, not vacuously
    assert ext.count() == p.count() > 0


@pytest.mark.parametrize(
    "hostile",
    [
        "plain words only",
        "a & b < c > d",
        "pre-escaped &amp; and &lt;p&gt; stay literal",
        "&amp;amp; double escapes",
        "<p>fake body</p><footer>fake chrome</footer>",
        "newline\nand\ttab",
        "unicode ß • ümlaut 日本語",
        "",
        "&",
        "&lt;",
    ],
)
def test_hostile_text_round_trips(spark, hostile):
    df = spark.createDataFrame(
        [("doc://t/1", hostile)], "url string, text string"
    ).withColumn("html", pages.html_of(F.col("url"), F.col("text")))
    row = textops.extract_text(df).head()
    assert row["extracted"] == hostile


def test_unused_html_column_is_pruned(spark):
    """A query over pages that never touches html must not compute the
    envelope: no encode() in the optimized plan."""
    p = pages.pages_from_documents(spark, "/root/testdata/sf0.001")
    plan = p.select("url", "lat", "lon")._jdf.queryExecution().optimizedPlan().toString()
    assert "encode" not in plan
    # ...while selecting it does
    plan_html = p.select("url", "html")._jdf.queryExecution().optimizedPlan().toString()
    assert "encode" in plan_html


def test_extraction_is_arrow_batched(spark):
    p = pages.pages_from_documents(spark, "/root/testdata/sf0.001")
    ext = textops.extract_text(p).select("url", "extracted")
    plan = ext._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan


def test_missing_body_yields_empty_not_crash(spark):
    df = spark.createDataFrame(
        [(bytearray(b"<html><body>no paragraph</body></html>"),), (None,)],
        "html binary",
    )
    rows = textops.extract_text(df).select("extracted").collect()
    assert [r["extracted"] for r in rows] == ["", None]

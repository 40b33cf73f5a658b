"""Cross-document boilerplate line removal (textops.boilerplate_strip).

Policy pinned here: a line is dropped EVERYWHERE once its document
frequency crosses min_df (unlike passage_dedup, which keeps the first
occurrence); within-doc repeats of a below-threshold line survive in
order; empty lines never count.
"""

import pyspark.sql.functions as F
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("boilerplate-tests", master="local[4]",
                    shuffle_partitions=8)


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_chrome_dropped_content_kept_in_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "SUBSCRIBE\nalpha beta\nmiddle one\nCOPYRIGHT"),
            (2, "SUBSCRIBE\ngamma delta\nCOPYRIGHT"),
            (3, "SUBSCRIBE\nalpha beta\nCOPYRIGHT"),
        ],
        "doc_id long, text string",
    )
    got = _rows(textops.boilerplate_strip(docs, min_df=2))
    # SUBSCRIBE/COPYRIGHT hit df=3, 'alpha beta' df=2 -> all dropped
    assert got[1]["text_kept"] == "middle one"
    assert got[2]["text_kept"] == "gamma delta"
    assert got[3]["text_kept"] == ""
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (4, 1)
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (3, 0)


def test_within_doc_repeats_do_not_cross_threshold(spark):
    """df counts DISTINCT docs: a line repeated 5x inside one doc is
    not boilerplate, and every repeat survives in order."""
    docs = spark.createDataFrame(
        [(1, "x\nx\nx\nx\nx"), (2, "y")], "doc_id long, text string"
    )
    got = _rows(textops.boilerplate_strip(docs, min_df=2))
    assert got[1]["text_kept"] == "x\nx\nx\nx\nx"
    assert got[1]["n_kept"] == 5


def test_empty_lines_ignored(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\n \nb"), (2, "\n\n")], "doc_id long, text string"
    )
    got = _rows(textops.boilerplate_strip(docs, min_df=2))
    assert got[1]["n_lines"] == 2 and got[1]["text_kept"] == "a\nb"
    assert 2 not in got  # all-blank doc has no countable lines


def test_df_shuffle_keys_are_hashes_not_lines(spark):
    """Plan shape: the document-frequency aggregate and the verdict
    join key on md5(line), never on the raw line payload."""
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a")], "doc_id long, text string"
    )
    plan = (
        textops.boilerplate_strip(docs, min_df=2)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "md5" in plan

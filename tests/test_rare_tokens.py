"""Cross-document rarity signal (textops.rare_token_ratio)."""

import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("rare-token-tests", master="local[4]",
                    shuffle_partitions=8)


def test_planted_ratios(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),            # cat, sat shared with doc 2
            (2, "the cat sat zorp"),       # zorp is doc-2-only
            (3, "the the THE qwix blug"),  # dup + case fold; 2 hapax
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in textops.rare_token_ratio(docs).collect()}
    # df: the=3, cat=2, sat=2, zorp=1, qwix=1, blug=1
    assert (rows[1].n_distinct, rows[1].n_rare) == (3, 0)
    assert (rows[2].n_distinct, rows[2].n_rare) == (4, 1)
    assert (rows[3].n_distinct, rows[3].n_rare) == (3, 2)
    assert rows[2].rare_ppm == 250000
    assert rows[3].rare_ppm == 666666  # floor division, exact int


def test_max_df_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r.n_rare
            for r in textops.rare_token_ratio(docs, max_df=2).collect()}
    # df: a=3, b=2, c=1 → rare(≤2): b, c
    assert rows == {1: 1, 2: 1, 3: 1}


def test_plan_no_window_no_collect(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(50)],
        "doc_id int, text string",
    )
    plan = (
        textops.rare_token_ratio(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    # df aggregates the already-distinct pairs: distinct + dfreq +
    # final rollup — partial/final HashAggregate pairs throughout
    assert "HashAggregate" in plan, plan

"""Physical-plan quality gates: the optimizations we design for must
actually appear in the plans Catalyst produces.

These tests read `.explain("formatted")` output and assert:
* filter + projection pushdown reach the parquet scan
* small dimension joins broadcast (no shuffle on the dim side)
* the flag-join + window pipeline contains exactly the expected number
  of exchanges (no accidental extra shuffles)
* native expressions stay inside WholeStageCodegen
"""

import os

import pytest

pyspark = pytest.importorskip("pyspark")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("plan-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_pushdown(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") <= F.lit("1998-09-02")).select(
        "l_returnflag", "l_quantity"
    )
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    # column pruning: the scan must read only the 3 referenced columns
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema
    assert "l_shipdate" in read_schema and "l_quantity" in read_schema


def test_flag_join_broadcasts(spark):
    from openstreetmap_license_change_spark.operators import lineage
    from openstreetmap_license_change_spark.sources import pages as pages_src

    flagged = lineage.with_accept_flags(
        pages_src.pages_from_documents(spark, SF_DIR),
        pages_src.cs_status(spark),
    )
    plan = plan_of(flagged)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_latest_version_is_single_shuffle_partial_agg(spark):
    from openstreetmap_license_change_spark.operators import lineage
    from openstreetmap_license_change_spark.sources import pages as pages_src

    latest = lineage.latest_version(
        pages_src.pages_from_documents(spark, SF_DIR).select(
            "url", "version", "lon", "lat"
        )
    )
    import re

    plan = plan_of(latest)
    # map-side partial aggregation before the single exchange
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "partial_max_by" in plan, plan
    assert "max_by" in plan


def test_latest_version_cols_prunes_struct_and_scan(spark):
    """cols= must keep the wide payload (text) OUT of the max_by
    aggregate buffer AND off the parquet scan: the winner struct rides
    the shuffle, so a 3-column request shuffling text would be the
    full-width-struct regression the operator exists to prevent."""
    import re

    from openstreetmap_license_change_spark.operators import lineage
    from openstreetmap_license_change_spark.sources import pages as pages_src

    latest = lineage.latest_version(
        pages_src.pages_from_documents(spark, SF_DIR),
        cols=["lon", "lat"],
    )
    assert set(latest.columns) == {"url", "version", "lon", "lat"}
    plan = plan_of(latest)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "partial_max_by" in plan, plan
    assert "text" not in plan, plan  # pruned from scan and agg buffer


def test_tile_rollup_whole_stage_codegen(spark):
    from pyspark.sql import functions as F

    from openstreetmap_license_change_spark.operators import spatial
    from openstreetmap_license_change_spark.sources import pages as pages_src

    pages = pages_src.pages_from_documents(spark, SF_DIR)
    rollup = spatial.tile_rollup(
        spatial.assign_cells(pages).withColumn("tainted", F.col("visible"))
    )
    import re

    plan = plan_of(rollup)
    # map-side combine then one exchange; all-native expressions
    assert "partial_count" in plan and "partial_sum" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    # the cell-assignment arithmetic must not introduce a Python UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # column pruning: only doc_id is read from the documents scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema and "lang" not in read_schema


def test_pip_rect_broadcasts_and_prunes(spark):
    from openstreetmap_license_change_spark.operators import spatial
    from openstreetmap_license_change_spark.sources import pages as pages_src

    pages = pages_src.pages_from_documents(spark, SF_DIR)
    rects = spark.createDataFrame(
        [(1, -180.0, -90.0, 0.0, 90.0)],
        "polygon_id INT, min_lon DOUBLE, min_lat DOUBLE, max_lon DOUBLE, max_lat DOUBLE",
    )
    plan = plan_of(spatial.pip_join_rect(pages, rects))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_cascade_no_forced_broadcast(spark):
    """The cascade's delete side is output-sized (millions of rows on a
    real run); the operator must not pin a broadcast hint — join
    strategy belongs to AQE, which sees actual sizes at runtime."""
    from openstreetmap_license_change_spark.operators import cascade as casc

    mk = spark.createDataFrame
    del_s = "element_id bigint"
    way_s = "element_id bigint, version int, tags_json string, nodes array<bigint>"
    rel_s = ("element_id bigint, version int, tags_json string, "
             "members array<struct<mtype:string, ref:bigint, role:string>>")
    node_deletes = mk([(1,)], del_s)
    ways = mk([(20, 1, "{}", [1, 2, 3])], way_s)

    # inspect the analyzed logical plan of the first-pass join before
    # execution: no ResolvedHint / broadcast function anywhere
    from pyspark.sql import functions as F

    nd = node_deletes.select(F.col("element_id").alias("del_id"))
    joined = (
        ways.select("element_id", F.explode("nodes").alias("ref"))
        .join(nd, F.col("ref") == F.col("del_id"), "inner")
    )
    analyzed = joined._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "BROADCAST" not in analyzed

    # and the cascade source itself must not hint: the only F.broadcast
    # calls allowed in operators/ are on genuinely dimension-sized
    # tables (flags, lists, rects) — not in cascade.py
    import inspect
    src = inspect.getsource(casc)
    assert "F.broadcast" not in src


def test_ivf_topk_is_exchange_free(spark):
    """IVF assignment is a map-side expression over the broadcast-scale
    codebook: no Exchange anywhere, global top-k via TakeOrdered."""
    import __spark_entry__ as entry

    df = entry.q_ivf_topk(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "Exchange" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_pip_polygons_prefiltered_broadcasts_candidates(spark):
    from openstreetmap_license_change_spark.operators import spatial
    from pyspark.sql import functions as F

    pts = spark.range(0, 50).select(
        F.concat(F.lit("p"), F.col("id")).alias("url"),
        (F.col("id") % 10 * 1.0).alias("lon"),
        (F.col("id") % 7 * 1.0).alias("lat"),
    )
    polys = [(1, [(0.0, 0.0), (8.0, 0.0), (8.0, 6.0), (0.0, 6.0), (0.0, 0.0)])]
    plan = plan_of(spatial.pip_join_polygons_prefiltered(pts, polys, res_deg=4.0))
    assert "BroadcastHashJoin" in plan, plan


def test_sampling_and_curation_plan_shapes(spark):
    """stratified_sample/group_topk: ONE exchange + WindowGroupLimit
    (only local top-k crosses the shuffle); deterministic_sample: a
    map-only filter, ZERO exchanges."""
    from pyspark.sql import functions as F

    from openstreetmap_license_change_spark.operators import sampling
    from openstreetmap_license_change_spark.sources import pages

    docs = pages.documents(spark, SF_DIR)
    import re

    p = plan_of(sampling.stratified_sample(docs, "lang", k=3))
    assert "WindowGroupLimit" in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p

    p = plan_of(
        sampling.group_topk(
            docs.withColumn("n", F.length("text")),
            ["lang"],
            [F.desc("n"), F.col("doc_id")],
            3,
        )
    )
    assert "WindowGroupLimit" in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p

    p = plan_of(sampling.deterministic_sample(docs, denom=8))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0, p


def test_knn_neighborhood_plan_shape(spark):
    """Probe explode + hash equi-join + WindowGroupLimit top-k: the
    same pushdown knn_in_cell relies on, with the ≤9× replication on
    the probe side only (no BroadcastNestedLoop anywhere)."""
    from openstreetmap_license_change_spark.operators import spatial
    from openstreetmap_license_change_spark.sources import pages

    docs = pages.documents(spark, SF_DIR).limit(50)
    pts = docs.selectExpr(
        "CAST(doc_id AS STRING) AS url",
        "CAST(doc_id % 360 - 180 AS DOUBLE) AS lon",
        "CAST(doc_id % 180 - 90 AS DOUBLE) AS lat",
    )
    cands = pts.selectExpr("url AS cand_url", "lon", "lat")
    p = plan_of(spatial.knn_neighborhood(pts, cands, k=3, res_deg=30.0))
    assert "WindowGroupLimit" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "Generate explode" in p or "Explode" in p or "explode" in p, p
    # the pair join builds a hash map over the density-bounded
    # candidate side instead of sort-merging (join_hint default):
    # both join-input sorts disappear from the plan
    assert "ShuffledHashJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_passage_dedup_two_shuffles_no_join(spark):
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.operators import textops
    from openstreetmap_license_change_spark.sources import pages as pages_src

    docs = pages_src.documents(spark, SF_DIR).select("doc_id", "text")
    df = textops.passage_dedup(docs, window=16)
    import re as _re
    plan = plan_of(df)
    # window-min on md5 + doc groupBy: exactly two hash exchanges,
    # and the winner rule is a window, never a self-join
    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    assert "Join" not in plan, plan


def test_domain_rollup_single_aggregate_chain(spark):
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.operators import textops

    pages = spark.createDataFrame(
        [("https://a.example.com/p", False)], "url string, tainted boolean"
    )
    import re as _re
    plan = plan_of(textops.domain_rollup(pages, taint_col="tainted"))
    # count(distinct) expands to the two-phase partial aggregate on the
    # same grouping — 2 exchanges, no join, all codegen
    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    assert "Join" not in plan
    assert "ArrowEvalPython" not in plan


def test_polyline_length_reuses_group_partitioning(spark):
    from openstreetmap_license_change_spark.operators import spatial

    pts = spark.createDataFrame(
        [("a", 1, 0.0, 0.0), ("a", 2, 1.0, 1.0)],
        "gid string, ord int, lon double, lat double",
    )
    df = spatial.polyline_length(pts, id_col="gid", order_col="ord")
    import re as _re
    plan = plan_of(df)
    # window and groupBy share the gid hash key; no Python, no join
    assert len(_re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan
    assert "ArrowEvalPython" not in plan and "Join" not in plan


def test_segment_crossing_join_shape(spark):
    from openstreetmap_license_change_spark.operators import spatial

    ddl = "sid string, lon1 double, lat1 double, lon2 double, lat2 double"
    a = spark.createDataFrame([("a", 0.0, 0.0, 1.0, 1.0)], ddl) \
        .withColumnRenamed("sid", "id_a")
    b = spark.createDataFrame([("b", 0.0, 1.0, 1.0, 0.0)], ddl) \
        .withColumnRenamed("sid", "id_b")
    # static-hint path (the AQE-off scaling protocol): one shuffled-hash
    # join on the cell key, exact predicate residual, no dedup aggregate
    # after the join (reference-point rule)
    df = spatial.segment_crossing_join(
        a, b, res_deg=1.0, join_hint="shuffle_hash"
    )
    plan = plan_of(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "HashAggregate" not in plan, plan
    assert "ArrowEvalPython" not in plan
    # default "auto" path: no static hint pinned, so AQE may broadcast-
    # or shuffled-hash-convert at runtime — the invariants that must
    # hold regardless of strategy: an equi-join on the cell key exists,
    # and still no dedup aggregate / no Python
    df_auto = spatial.segment_crossing_join(a, b, res_deg=1.0)
    plan_auto = plan_of(df_auto)
    assert "Join" in plan_auto, plan_auto
    assert "HashAggregate" not in plan_auto, plan_auto
    assert "ArrowEvalPython" not in plan_auto


def test_geocode_rollups_stay_native(spark):
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.operators import spatial

    pts = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    df = pts.groupBy(
        spatial.geohash(F.col("lon"), F.col("lat"), 5).alias("gh")
    ).count()
    plan = plan_of(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    df2 = pts.groupBy(
        spatial.quadkey(F.col("lon"), F.col("lat"), 8).alias("qk")
    ).count()
    plan2 = plan_of(df2)
    assert "ArrowEvalPython" not in plan2 and "BatchEvalPython" not in plan2

"""Kill-and-resume: a re-run over an existing work dir must skip
committed stages (audit lineage match) and produce identical outputs;
a lineage change must invalidate and recompute."""

import json
import os
import shutil

import pytest

pyspark = pytest.importorskip("pyspark")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("resume-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def test_pipeline_runs_and_resumes(spark, tmp_path_factory):
    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline

    work = str(tmp_path_factory.mktemp("pipe"))
    out1 = run_pipeline(spark, SF_DIR, work)
    counts1 = {k: v.count() for k, v in out1.items()}
    assert counts1["pages"] > 0
    assert counts1["actions"] > 0

    audit1 = json.load(open(os.path.join(work, "_audit.json")))
    assert set(audit1) == set(out1)
    for stage, meta in audit1.items():
        assert meta["rows"] == counts1[stage]
        assert meta["bytes"] > 0

    # simulate a crash after partial completion: drop later stages'
    # checkpoints, keep early ones
    for stage in ("actions", "tile_rollup", "ordered_actions"):
        shutil.rmtree(os.path.join(work, stage))
        audit1.pop(stage)
    with open(os.path.join(work, "_audit.json"), "w") as f:
        json.dump(audit1, f)

    out2 = run_pipeline(spark, SF_DIR, work)
    counts2 = {k: v.count() for k, v in out2.items()}
    assert counts2 == counts1

    audit2 = json.load(open(os.path.join(work, "_audit.json")))
    # early stages were NOT recomputed (audit entries unchanged)
    assert audit2["pages"] == audit1["pages"]
    assert audit2["flagged"] == audit1["flagged"]
    # later stages were recommitted
    assert "actions" in audit2 and "ordered_actions" in audit2


def test_lineage_change_invalidates(spark, tmp_path_factory):
    from openstreetmap_license_change_spark.plans.pipeline import StageRunner

    work = str(tmp_path_factory.mktemp("stage"))
    runner = StageRunner(spark, work)
    df1 = runner.run("s", "key-a", lambda: spark.range(0, 10))
    assert df1.count() == 10
    # same lineage: resumed (build fn must not run)
    df2 = StageRunner(spark, work).run(
        "s", "key-a", lambda: (_ for _ in ()).throw(AssertionError("rebuilt"))
    )
    assert df2.count() == 10
    # changed lineage: rebuilt
    df3 = StageRunner(spark, work).run("s", "key-b", lambda: spark.range(0, 5))
    assert df3.count() == 5


def test_pipeline_with_exclusions(spark, tmp_path_factory):
    """P3 wired into the pipeline: excluded urls surface as
    delete+redact-all action rows and never reach the fold."""
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline
    from openstreetmap_license_change_spark.sources import pages as pages_src

    work = str(tmp_path_factory.mktemp("pipe_excl"))
    # exclude two real urls from the input
    some = (
        pages_src.pages_from_documents(spark, SF_DIR)
        .select("url").distinct().orderBy("url").limit(2)
    )
    exclusions = some.select(F.lit("node").alias("element_type"), "url")
    excluded_urls = {r.url for r in exclusions.collect()}

    out = run_pipeline(spark, SF_DIR, work, exclusions=exclusions)
    acts = out["actions"].where(F.col("url").isin(list(excluded_urls)))
    got = {(r.url, r.action, r.mode) for r in acts.collect()}
    for url in excluded_urls:
        assert (url, "delete", None) in got
        assert (url, "redact", "hidden") in got
    # every action for an excluded url is delete or hidden-redact
    assert all(a in ("delete", "redact") for (_, a, _) in got)

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


def test_bucketed_pipeline_elides_url_exchanges(spark, tmp_path_factory):
    """The default (bucketed) pipeline's url-keyed consumers read the
    flagged stage with the bucket spec attached: the fold runs with
    ZERO exchanges, and so does the latest-version snapshot — the
    100-TB shuffle-amortization contract, asserted at the pipeline
    level, not just in operator isolation."""
    from openstreetmap_license_change_spark.operators import fold, lineage
    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline

    work = str(tmp_path_factory.mktemp("pipe_bkt"))
    out = run_pipeline(spark, SF_DIR, work, bucketed=True)
    flagged = out["flagged"]  # bucketed table handle

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    fold_plan = plan(
        fold.classify_histories(
            fold.pages_histories(flagged), assume_partitioned=True
        )
    )
    assert "Exchange" not in fold_plan, fold_plan
    # "no Exchange" alone is vacuous if the planner demoted the
    # bucketed scan (DisableUnnecessaryBucketedScan) — then the skipped
    # repartition means urls span partitions and the fold is WRONG.
    # The scan must actually be bucket-aware.
    assert "Bucketed: true" in fold_plan, fold_plan

    latest_plan = plan(lineage.latest_version(flagged.select("url", "version")))
    assert "Exchange" not in latest_plan, latest_plan
    assert "Bucketed: true" in latest_plan, latest_plan

    # control: the plain-parquet pipeline's flagged stage DOES shuffle
    # for the same consumers — the bucket spec, not data size, removed
    # the exchanges above
    work_p = str(tmp_path_factory.mktemp("pipe_plain"))
    flagged_p = run_pipeline(spark, SF_DIR, work_p, bucketed=False)["flagged"]
    assert "Exchange" in plan(
        lineage.latest_version(flagged_p.select("url", "version"))
    )


def test_demoted_bucketed_scan_falls_back_to_repartition(
    spark, tmp_path_factory
):
    """If a caller's session leaves autoBucketedScan ON, Spark demotes
    the bucketed scan under the fold's mapInPandas plan ('Bucketed:
    false (disabled by query planner)') and the assume_partitioned
    contract is broken.  classify_histories must detect the demotion
    at planning time, warn, and reinstate the url repartition — same
    action rows, never a fragment-wise fold."""
    import warnings as w

    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.operators import fold
    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline

    work = str(tmp_path_factory.mktemp("pipe_demoted"))
    out = run_pipeline(spark, SF_DIR, work, bucketed=True)
    flagged = out["flagged"]
    expected = sorted(
        (r.url, r.action, r.version, r.mode)
        for r in out["actions"].collect()
    )

    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark.conf.set(conf, "true")
    try:
        with w.catch_warnings(record=True) as caught:
            w.simplefilter("always")
            demoted = fold.classify_histories(
                fold.pages_histories(flagged), assume_partitioned=True
            )
            plan = demoted._jdf.queryExecution().executedPlan().toString()
            got = sorted(
                (r.url, r.action, r.version, r.mode)
                for r in demoted.collect()
            )
        assert any("demoted" in str(c.message) for c in caught), [
            str(c.message) for c in caught
        ]
        # the fallback reinstated the shuffle
        assert "Exchange" in plan or "exchange" in plan, plan
        assert got == expected
    finally:
        spark.conf.set(conf, "false")


def test_bucketed_pipeline_matches_unbucketed(spark, tmp_path_factory):
    """A/B: identical action rows with and without bucketed staging."""
    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline

    w_b = str(tmp_path_factory.mktemp("pipe_b"))
    w_p = str(tmp_path_factory.mktemp("pipe_p"))
    acts_b = run_pipeline(spark, SF_DIR, w_b, bucketed=True)["actions"]
    acts_p = run_pipeline(spark, SF_DIR, w_p, bucketed=False)["actions"]
    key = lambda r: (r.url, r.action, r.version, r.mode, r.new_tags_json)
    assert sorted(map(key, acts_b.collect())) == sorted(
        map(key, acts_p.collect())
    )


def test_bucketed_resume_reregisters_table(spark, tmp_path_factory):
    """A fresh session has no catalog entry for the committed bucketed
    stage; resume must re-register the external table from the audited
    schema — with the bucket spec intact (exchange still elided)."""
    from openstreetmap_license_change_spark.operators import lineage
    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline

    work = str(tmp_path_factory.mktemp("pipe_rereg"))
    out1 = run_pipeline(spark, SF_DIR, work, bucketed=True)
    n1 = out1["flagged"].count()

    # simulate a new session: drop every stage table from the catalog
    for t in spark.catalog.listTables():
        if t.name.startswith("stage_flagged_"):
            spark.sql(f"DROP TABLE {t.name}")

    out2 = run_pipeline(spark, SF_DIR, work, bucketed=True)
    flagged = out2["flagged"]
    assert flagged.count() == n1
    plan = (
        lineage.latest_version(flagged.select("url", "version"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan

"""End-to-end pipeline with stage checkpoints, audit lineage, resume.

The reference tracks progress in `regions`/`candidates` status tables
so a killed bot resumes where it left off (run_bot.rb:41-103,
run_regions.rb:20-23).  Here every stage writes a parquet checkpoint
plus an audit row (stage, rows, bytes, wall seconds, input lineage
hash); a re-run skips stages whose checkpoint + matching lineage hash
already exist — kill-and-resume lands on the last committed stage.

On a production deployment these checkpoints are Iceberg table commits
(atomic snapshot per stage; resume = read last snapshot).  The sandbox
has no Iceberg runtime jar, so the same contract is implemented with
parquet dirs + a JSON audit ledger written atomically via rename; the
stage API is identical either way.

Stage graph (SURVEY.md §3 lifecycle equivalent):
    pages → flags(J1/J2) → cells(F14') → histories → fold(A7)
          → pip(J10) → rollup → ordered actions
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import exclusions as excl_ops
from ..operators import fold, lineage, spatial
from ..sources import pages as pages_src


class StageRunner:
    """Checkpoint/resume executor: run(stage, lineage_key, build_fn)."""

    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        self.audit_path = os.path.join(work_dir, "_audit.json")
        os.makedirs(work_dir, exist_ok=True)
        self.audit = self._load_audit()

    def _load_audit(self) -> dict:
        try:
            with open(self.audit_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _commit_audit(self) -> None:
        tmp = self.audit_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.audit, f, indent=1, sort_keys=True)
        os.replace(tmp, self.audit_path)  # atomic commit

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.work_dir, stage)

    def run(self, stage: str, lineage_key: str, build) -> DataFrame:
        """Build-or-resume: if the stage committed with the same lineage
        key, read the checkpoint; else compute, write, commit."""
        path = self._stage_dir(stage)
        meta = self.audit.get(stage)
        if meta and meta.get("lineage") == lineage_key and os.path.isdir(path):
            return self.spark.read.parquet(path)

        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        rows = out.count()
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
        self.audit[stage] = {
            "lineage": lineage_key,
            "rows": rows,
            "bytes": nbytes,
            "wall_sec": round(time.time() - t0, 3),
            "committed_at_stage_order": len(self.audit),
        }
        self._commit_audit()
        return out

    def run_sink(
        self, stage: str, lineage_key: str, write, path: str | None = None
    ) -> str:
        """Build-or-resume a non-parquet SINK stage (e.g. the S9
        osmChange text shards): ``write(path)`` must materialize the
        sink under ``path`` and return its row count.  Same commit
        contract as ``run``: the audit row (rows/bytes/wall/lineage)
        lands only after the write completes, so a kill mid-write
        leaves an uncommitted stage that resume re-runs from scratch
        (the sink write is overwrite-mode, hence idempotent)."""
        path = path or self._stage_dir(stage)
        meta = self.audit.get(stage)
        if meta and meta.get("lineage") == lineage_key and os.path.isdir(path):
            return path
        t0 = time.time()
        rows = write(path)
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
        self.audit[stage] = {
            "lineage": lineage_key,
            "rows": rows,
            "bytes": nbytes,
            "wall_sec": round(time.time() - t0, 3),
            "committed_at_stage_order": len(self.audit),
        }
        self._commit_audit()
        return path

    def run_bucketed(
        self,
        stage: str,
        lineage_key: str,
        build,
        key: str = "url",
        buckets: int = 32,
    ) -> DataFrame:
        """Build-or-resume a stage committed as a BUCKETED table
        (sources/bucketed.py): downstream url-keyed stages read it
        with the bucket spec attached and Catalyst elides their
        Exchange.  Resume in a fresh session re-registers the external
        table from the audited schema (Iceberg analogue: the bucket
        partition transform lives in the table metadata, so this
        re-registration step disappears on a real deployment)."""
        from ..sources import bucketed as bkt

        path = self._stage_dir(stage)
        # table names are session-global; scope to this work_dir so
        # concurrent pipelines can't resume from each other's tables
        scope = hashlib.md5(path.encode()).hexdigest()[:8]
        table = f"stage_{stage}_{scope}"
        meta = self.audit.get(stage)
        if meta and meta.get("lineage") == lineage_key and os.path.isdir(path):
            if not self.spark.catalog.tableExists(table):
                ddl = meta["schema_ddl"]
                sort_cols = meta["sort_cols"]
                self.spark.sql(
                    f"CREATE TABLE {table} ({ddl}) USING parquet "
                    f"CLUSTERED BY ({key}) "
                    f"SORTED BY ({', '.join(sort_cols)}) "
                    f"INTO {meta['buckets']} BUCKETS "
                    f"LOCATION '{path}'"
                )
            return bkt.read_bucketed(self.spark, table)

        t0 = time.time()
        df = build()
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        bkt.write_bucketed(df, table, path, key=key, buckets=buckets)
        out = bkt.read_bucketed(self.spark, table)
        rows = out.count()
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
        sort_cols = [key] + (["version"] if "version" in df.columns else [])
        self.audit[stage] = {
            "lineage": lineage_key,
            "rows": rows,
            "bytes": nbytes,
            "wall_sec": round(time.time() - t0, 3),
            "committed_at_stage_order": len(self.audit),
            "bucketed_by": key,
            "buckets": buckets,
            "sort_cols": sort_cols,
            "schema_ddl": ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
            ),
        }
        self._commit_audit()
        return out


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    exclusions: DataFrame | None = None,
    osmchange_dir: str | None = None,
    bucketed: bool = True,
    pages_builder=None,
) -> dict[str, DataFrame]:
    """Full batch run, checkpointed per stage. Returns stage outputs.

    ``exclusions`` (optional): (element_type, url) rows — the
    reference's hard-exclusion list (db.rb:38-48).  Excluded elements
    bypass the fold via the broadcast split (change_bot.rb:214-218)
    and surface as delete+redact-all action rows.

    ``pages_builder`` (optional): ``callable(spark, sf_dir) ->
    DataFrame`` replacing the default pages derivation — used by the
    amplified-scale soak (scripts/soak_resume.py) to run the identical
    pipeline over a ×N-replicated input.

    ``bucketed`` (default True — the 100-TB path): the ``flagged``
    stage commits as a url-bucketed table, so every downstream
    url-keyed consumer — the fold's history grouping, the
    latest-version snapshot for the osmChange sink — reads
    pre-co-located data with ZERO url exchanges
    (tests/test_pipeline_resume.py asserts the plans).  ``False``
    keeps plain parquet checkpoints (useful when the consumer set is
    unknown and the bucketed write's sort cost isn't amortized).
    """
    runner = StageRunner(spark, work_dir)
    key = sf_dir  # lineage key: input identity (prod: snapshot id)

    build = pages_builder or pages_src.pages_from_documents
    pages = runner.run("pages", key, lambda: build(spark, sf_dir))
    stage_flagged = runner.run_bucketed if bucketed else runner.run
    flagged = stage_flagged(
        "flagged",
        key,
        lambda: lineage.with_accept_flags(pages, pages_src.cs_status(spark)),
    )
    cells = runner.run(
        "cells",
        key,
        lambda: spatial.assign_cells(flagged).withColumn(
            "tainted", ~F.col("accepted")
        ),
    )
    def build_actions():
        # NOTE: the P1 candidate semi-join (lineage.candidate_filter)
        # is deliberately NOT applied here: measured on the bench it
        # adds a second full-side exchange (and re-derivation of the
        # input) that costs more than it saves, because the fold's
        # vectorized all-accepted prune already skips clean histories
        # after its single shuffle — and exclusions must reach the
        # fold even when their history is clean
        hist = fold.pages_histories(flagged)
        if exclusions is not None:
            return excl_ops.classify_with_exclusions(
                hist, exclusions, assume_partitioned=bucketed
            )
        return fold.classify_histories(hist, assume_partitioned=bucketed)

    actions = runner.run("actions", key, build_actions)
    rollup = runner.run(
        "tile_rollup", key, lambda: spatial.tile_rollup(cells)
    )
    ordered = runner.run(
        "ordered_actions",
        key,
        lambda: actions.orderBy(
            F.when(F.col("action") == "edit", 0)
            .when(F.col("action") == "delete", 1)
            .otherwise(2),
            "element_type",
            "url",
            "version",
        ),
    )
    if osmchange_dir is not None:
        # S9: the changeset document — edits+deletes as osmChange XML
        # shards (redactions stay API-side, change_bot.rb:296-319) —
        # committed as an audited sink stage so the ledger carries its
        # rows/bytes/wall and resume skips a completed export
        from . import osmchange as oc

        latest = lineage.latest_version(flagged.select("url", "version"))
        runner.run_sink(
            "osmchange",
            key,
            lambda path: oc.write_osmchange(
                oc.actions_to_osmchange_input(actions, latest), path
            ),
            path=osmchange_dir,
        )

    return {
        "pages": pages,
        "flagged": flagged,
        "cells": cells,
        "actions": actions,
        "tile_rollup": rollup,
        "ordered_actions": ordered,
    }

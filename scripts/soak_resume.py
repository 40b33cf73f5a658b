#!/usr/bin/env python3
"""Amplified-scale end-to-end soak with kill-and-resume.

Exercises the 100×-scale claim as ONE pipeline instead of per-operator
benches: runs ``plans.pipeline.run_pipeline`` (bucketed default) over
an amplified pages input (default ×2048 over sf0.1 ≈ 25.6M pages),
SIGKILLs the process mid-fold (a watchdog waits for the ``actions``
stage write to begin, then ``os._exit(137)`` — a genuine mid-write
death, not a polite exception), resumes in a fresh process against the
same work dir, and asserts the final ordered actions are IDENTICAL to
an uninterrupted run in a separate work dir.  Per-stage rows / bytes /
wall-seconds come from the audit ledger both runs write
(plans/pipeline.py StageRunner).

Usage:
    python scripts/soak_resume.py [--repl N] [--sf-dir DIR]

Modes (internal):
    --child WORK [--kill-on-stage STAGE]   run the pipeline once
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

SF_DEFAULT = "/root/testdata/sf0.1"


def _amplified_builder(repl):
    def build(spark, sf_dir):
        from bench import _amplified_pages

        return _amplified_pages(spark, sf_dir, repl)

    return build


def child(work, sf_dir, repl, kill_on_stage):
    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline
    from openstreetmap_license_change_spark.session import get_spark

    if kill_on_stage:
        stage_dir = os.path.join(work, kill_on_stage)

        def watchdog():
            # die the moment the stage's tasks start STREAMING output
            # (first part- file in the in-flight _temporary tree) — a
            # genuine mid-write death: the checkpoint is half-written
            # and the audit ledger has NOT committed the stage
            while True:
                for root, _dirs, files in os.walk(stage_dir):
                    if any(f.startswith("part-") for f in files):
                        sys.stderr.write(
                            f"[soak] killing mid-{kill_on_stage} write\n"
                        )
                        sys.stderr.flush()
                        os._exit(137)
                time.sleep(0.05)

        threading.Thread(target=watchdog, daemon=True).start()

    spark = get_spark("soak")
    oc_dir = os.path.join(work, "osmchange")
    out = run_pipeline(
        spark, sf_dir, work, pages_builder=_amplified_builder(repl),
        osmchange_dir=oc_dir,
    )
    # a tiny deterministic digest of the final output, for the parent
    from pyspark.sql import functions as F

    digest = (
        out["ordered_actions"]
        .select(
            F.count(F.lit(1)).alias("n"),
            # sum of pmod(hash, 2^31): order-insensitive digest that
            # cannot overflow int64 under ANSI mode (rows × 2³¹ « 2⁶³)
            F.sum(
                F.pmod(
                    F.xxhash64(
                        "url", "element_type", "action", "version",
                        "mode", "new_tags_json",
                    ),
                    F.lit(2 ** 31),
                )
            ).alias("h"),
        )
        .collect()[0]
    )
    # S9 sink audit: the osmChange body's global sort keys are a total
    # order, so line count / byte sum / line-hash sum are deterministic
    # regardless of where the range partitioner cuts the shards
    oc = (
        spark.read.text(os.path.join(oc_dir, "body"))
        .select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("value") + F.lit(1)).alias("nbytes"),
            F.sum(F.pmod(F.xxhash64("value"), F.lit(2 ** 31))).alias("h"),
        )
        .collect()[0]
    )
    print(json.dumps({
        "rows": digest.n,
        "hash": digest.h,
        "osmchange": {"lines": oc.n, "bytes": oc.nbytes, "hash": oc.h},
    }))
    spark.stop()


def run_child(work, sf_dir, repl, kill_on_stage=None, timeout=3600):
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--child", work, "--sf-dir", sf_dir, "--repl", str(repl),
    ]
    if kill_on_stage:
        cmd += ["--kill-on-stage", kill_on_stage]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    wall = time.time() - t0
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    return proc.returncode, (json.loads(line[-1]) if line else None), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=2048)
    ap.add_argument("--sf-dir", default=SF_DEFAULT)
    ap.add_argument("--child")
    ap.add_argument("--kill-on-stage")
    args = ap.parse_args()

    if args.child:
        child(args.child, args.sf_dir, args.repl, args.kill_on_stage)
        return

    base = "/dev/shm/soak"
    shutil.rmtree(base, ignore_errors=True)
    work = f"{base}/resumed"
    ref = f"{base}/uninterrupted"
    os.makedirs(work, exist_ok=True)
    os.makedirs(ref, exist_ok=True)

    print(f"[soak] run 1: kill mid-actions (repl={args.repl}) ...")
    rc, _, w1 = run_child(work, args.sf_dir, args.repl, kill_on_stage="actions")
    assert rc == 137, f"expected SIGKILL-style exit 137, got {rc}"
    audit = json.load(open(f"{work}/_audit.json"))
    assert "actions" not in audit, "actions must NOT be committed at kill"
    committed_at_kill = sorted(audit)
    print(f"[soak]   killed after {w1:.0f}s; committed: {committed_at_kill}")

    print("[soak] run 2: resume against the same work dir ...")
    rc2, digest_resumed, w2 = run_child(work, args.sf_dir, args.repl)
    assert rc2 == 0, "resume failed"
    audit2 = json.load(open(f"{work}/_audit.json"))
    for s in committed_at_kill:
        assert audit2[s] == audit[s], f"stage {s} was recomputed on resume"

    print("[soak] run 3: uninterrupted reference run ...")
    rc3, digest_ref, w3 = run_child(ref, args.sf_dir, args.repl)
    assert rc3 == 0

    assert digest_resumed == digest_ref, (
        f"DIVERGENCE: resumed {digest_resumed} vs uninterrupted {digest_ref}"
    )
    audit_ref = json.load(open(f"{ref}/_audit.json"))
    report = {
        "repl": args.repl,
        "pages": audit_ref["pages"]["rows"],
        "kill_after_sec": round(w1, 1),
        "resume_sec": round(w2, 1),
        "uninterrupted_sec": round(w3, 1),
        "digest": digest_ref,
        "stages": {
            s: {k: m[k] for k in ("rows", "bytes", "wall_sec")}
            for s, m in sorted(
                audit_ref.items(),
                key=lambda kv: kv[1]["committed_at_stage_order"],
            )
        },
        "committed_at_kill": committed_at_kill,
    }
    print("[soak] PASS — resumed == uninterrupted")
    print(json.dumps(report, indent=1))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

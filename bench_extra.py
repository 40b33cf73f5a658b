#!/usr/bin/env python3
"""Round-6 optimization harness (bench.py stays FROZEN — guide §1.4).

Per-query isolation on top of the frozen bench's own registration
machinery: re-uses ``bench.run_queries`` so the DataFrames timed here
are THE ones the driver times, but adds
  --explain <query ...>   dump .explain("formatted") to plans/r06/
  --time <query ...>      noop-sink per-query seconds (N rounds, min)

Usage:
  python bench_extra.py --time doc_pagerank lt_influence
  python bench_extra.py --explain doc_pagerank --suffix before
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the frozen harness; we only borrow its builders


def _capture_plans(spark, sf_dir, names, suffix):
    """Monkeypatch the noop writer so 'running' a query dumps its plan
    instead: each thunk builds its DataFrame lazily, so one pass with
    rounds=1 per query gives the plan with no query data computed.
    One query per run_queries pass keeps the name→plan mapping exact
    (a shared stage dir keeps the staging cost one-time)."""
    os.makedirs("plans/r06", exist_ok=True)
    os.environ["SPARK_GRAFT_BENCH_BEST_OF"] = "1"
    os.environ.setdefault("SPARK_GRAFT_STAGE_DIR", "/dev/shm/bench_extra_stage")
    orig_noop = bench._noop_write
    for name in names:
        captured = []

        def plan_write(df):
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            captured.append(buf.getvalue())

        os.environ["SPARK_GRAFT_BENCH_ONLY"] = name
        bench._noop_write = plan_write
        try:
            bench.run_queries(spark, sf_dir)
        finally:
            bench._noop_write = orig_noop
        if not captured:
            print(f"WARNING: no plan captured for {name}", file=sys.stderr)
            continue
        path = f"plans/r06/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(captured[-1])
        print(f"wrote {path} ({len(captured[-1])} bytes)")


def main():
    argv = sys.argv[1:]
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    mode = "--time"
    suffix = "before"
    names = []
    it = iter(argv)
    for a in it:
        if a in ("--time", "--explain"):
            mode = a
        elif a == "--suffix":
            suffix = next(it)
        elif a == "--rounds":
            os.environ["SPARK_GRAFT_BENCH_BEST_OF"] = next(it)
        else:
            names.append(a)
    if not names:
        print("no queries given", file=sys.stderr)
        sys.exit(2)

    from openstreetmap_license_change_spark.session import get_spark

    spark = get_spark("bench-extra")
    try:
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        if mode == "--explain":
            _capture_plans(spark, sf_dir, names, suffix)
        else:
            os.environ["SPARK_GRAFT_BENCH_ONLY"] = ",".join(names)
            timings, _ = bench.run_queries(spark, sf_dir)
            for k, v in timings.items():
                print(f"{k:24s} {v}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

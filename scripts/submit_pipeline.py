#!/usr/bin/env python3
"""spark-submit entry point for the full pipeline.

Ship as:  spark-submit --py-files dist/openstreetmap_license_change_spark-*.whl \
              scripts/submit_pipeline.py --sf-dir <input> --work-dir <ckpt>

Runs unchanged at any executor count; kill it mid-run and resubmit —
it resumes from the last committed stage checkpoint (see
plans/pipeline.py).  Build the wheel with `python -m build --wheel` or
`pip wheel . -w dist/`.
"""

import argparse
import json
import os
import sys
import time

# allow `python scripts/submit_pipeline.py` straight from a checkout
# (spark-submit --py-files makes this a no-op)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/olcs_pipeline")
    ap.add_argument(
        "--osmchange-dir",
        default=None,
        help="also emit the osmChange XML document shards here (S9)",
    )
    ap.add_argument(
        "--no-bucketed",
        action="store_true",
        help="stage with plain parquet checkpoints instead of the "
        "default url-bucketed table (which elides downstream shuffles)",
    )
    args = ap.parse_args()

    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline
    from openstreetmap_license_change_spark.session import get_spark

    spark = get_spark("olcs-pipeline")
    t0 = time.time()
    outputs = run_pipeline(
        spark,
        args.sf_dir,
        args.work_dir,
        osmchange_dir=args.osmchange_dir,
        bucketed=not args.no_bucketed,
    )
    summary = {
        name: df.count() for name, df in outputs.items()
    }
    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

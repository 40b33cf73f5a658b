#!/usr/bin/env python3
"""Ad-hoc single-element query — the analogue of the reference's
check_history.rb CLI (fetch one element's history, classify it, print
the actions).

Usage: python scripts/check_url.py --sf-dir /root/testdata/sf0.001 \
           --url doc://web/42
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--url", required=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from openstreetmap_license_change_spark.operators import fold, lineage
    from openstreetmap_license_change_spark.session import get_spark
    from openstreetmap_license_change_spark.sources import pages as pages_src

    spark = get_spark("check-url", master="local[2]", shuffle_partitions=4)
    flagged = lineage.with_accept_flags(
        pages_src.pages_from_documents(spark, args.sf_dir),
        pages_src.cs_status(spark),
    ).where(F.col("url") == args.url)

    history = flagged.orderBy("version").collect()
    if not history:
        print(f"no such url: {args.url}")
        spark.stop()
        return 1

    print(f"history of {args.url}:")
    for r in history:
        print(
            f"  v{r.version} cs={r.changeset_id} uid={r.uid} "
            f"visible={r.visible} accepted={r.accepted} "
            f"pos=({r.lon:.4f},{r.lat:.4f})"
        )

    actions = fold.classify_histories(fold.pages_histories(flagged)).collect()
    print("actions:")
    if not actions:
        print("  (clean — nothing to do)")
    for a in actions:
        print(f"  {a.action} v={a.version} mode={a.mode} tags={a.new_tags_json}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""One-shot wall-time + plan-shape probe for individual queries()
entries at a given sf_dir — the quick feedback loop for new operators
(bench.py stays the pinned headline protocol).

Usage: python scripts/probe_ops.py <sf_dir> <query> [query ...]

Prints per query: rows, wall seconds (count() end to end, cold within
the session), and the number of shuffle exchanges / broadcast
exchanges / pandas UDF nodes in the executed plan.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from openstreetmap_license_change_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("probe-ops")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        t0 = time.time()
        n = df.count()
        wall = time.time() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(
            f"{name}: rows={n} wall={wall:.2f}s "
            f"exchanges={plan.count('Exchange') - plan.count('BroadcastExchange')} "
            f"broadcasts={plan.count('BroadcastExchange')} "
            f"pandas_udf={plan.count('ArrowEvalPython') + plan.count('FlatMapGroupsInPandas') + plan.count('MapInPandas')}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

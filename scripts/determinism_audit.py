#!/usr/bin/env python3
"""Parallelism-determinism audit: run every queries() entry under two
DIFFERENT Spark configurations (cores + shuffle partitions) and assert
the canonical result sets are identical.

The DuckDB oracle gate proves engine-to-engine agreement at one
configuration; this audit proves the OTHER invariant a 1000-executor
deployment needs — that no operator's output depends on physical
partitioning, task count, or aggregation order (accidental
`first()`-style nondeterminism, float accumulation order, unstable
tie-breaks).  Every operator in this engine is designed around exact
integer arithmetic and total-order tie-breaks precisely so this holds;
here it is measured, not asserted.

Usage: python scripts/determinism_audit.py [sf_dir] [query ...]
Child mode (internal): --child <sf_dir> <queries...> with SPARK_* env.
"""

import hashlib
import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    {"master": "local[3]", "sp": "7"},
    {"master": "local[8]", "sp": "32"},
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(bool(v))
    if v is None:
        return "∅"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def child(sf_dir: str, names: list[str]) -> None:
    import __spark_entry__ as entrymod
    from openstreetmap_license_change_spark.session import get_spark

    spark = get_spark(
        "determinism-audit",
        master=os.environ["AUDIT_MASTER"],
        shuffle_partitions=int(os.environ["AUDIT_SP"]),
    )
    qs = entrymod.queries()
    out = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        cols = sorted(df.columns)
        rows = sorted(
            tuple(canon(r[c]) for c in cols) for r in df.collect()
        )
        h = hashlib.md5(
            ("|".join(cols) + "\n"
             + "\n".join("\t".join(r) for r in rows)).encode()
        ).hexdigest()
        out[name] = {"rows": len(rows), "hash": h}
    print("AUDIT_JSON:" + json.dumps(out))


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3:])
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod

    names = sys.argv[2:] or sorted(entrymod.queries())
    results = []
    for cfg in CONFIGS:
        env = dict(os.environ, AUDIT_MASTER=cfg["master"],
                   AUDIT_SP=cfg["sp"])
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             sf_dir, *names],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines()
                if l.startswith("AUDIT_JSON:")]
        if p.returncode != 0 or not line:
            sys.stderr.write(p.stderr[-3000:] + "\n")
            print(f"FATAL: child failed under {cfg}")
            return 2
        results.append(json.loads(line[-1][len("AUDIT_JSON:"):]))

    a, b = results
    bad = 0
    for name in names:
        if a[name] == b[name]:
            print(f"OK    {name}: {a[name]['rows']} rows, "
                  f"identical under {CONFIGS[0]} vs {CONFIGS[1]}")
        else:
            bad += 1
            print(f"FAIL  {name}: {a[name]} vs {b[name]}")
    print("all deterministic" if bad == 0 else f"{bad} NONDETERMINISTIC")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

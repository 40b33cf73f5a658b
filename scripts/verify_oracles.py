#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row counts + order-insensitive values (column-name sorted).

Usage: python scripts/verify_oracles.py [sf_dir] [query ...]
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from openstreetmap_license_change_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
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
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


# The driver's value hash is TYPE-sensitive (round-2 lesson: DuckDB
# promotes SUM(INTEGER)/windowed SUM to HUGEINT -> arrow decimal128,
# which hash-mismatches Spark's int64 even when every value is equal).
# Map both engines' types to a coarse family and require equality.
def _spark_type_family(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "time"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_type_family(dt.elementType)}>"
    return dt.simpleString()


def _arrow_type_family(at) -> str:
    import pyarrow as pa

    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_floating(at):
        return "float"
    if pa.types.is_decimal(at):
        return "decimal"  # e.g. DuckDB HUGEINT -> decimal128(38,0)
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "str"
    if pa.types.is_temporal(at):
        return "time"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return f"list<{_arrow_type_family(at.value_type)}>"
    return str(at)


def type_mismatches(sdf, con, sql):
    arrow_schema = con.execute(sql).arrow().schema
    d_fam = {f.name: _arrow_type_family(f.type) for f in arrow_schema}
    s_fam = {f.name: _spark_type_family(f.dataType) for f in sdf.schema.fields}
    return [
        (c, s_fam[c], d_fam[c])
        for c in sorted(set(s_fam) & set(d_fam))
        if s_fam[c] != d_fam[c]
    ]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("verify-oracles", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(s_cols)} != {sorted(d_cols)}")
            continue
        rs, rd = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
        if len(rs) != len(rd):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(rs)} duckdb={len(rd)}")
            continue
        if rs != rd:
            failures.append(name)
            diff = [(a, b) for a, b in zip(rs, rd) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            continue
        tm = type_mismatches(sdf, con, oracles[name])
        if tm:
            failures.append(name)
            print(f"FAIL  {name}: type family mismatch (spark vs duckdb): {tm}")
            continue
        print(f"OK    {name}: {len(rs)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

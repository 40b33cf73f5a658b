"""HyperLogLog register sketch (operators/sketches.py).

The register-max sibling of KMV: no DISTINCT, no rank window — one
map-side-combined groupBy((group, idx), max(rho)) is the whole sketch,
so duplicates never cross the shuffle.  Mirrors the reference's
distinct-counter audits (run_candidates.rb / run_regions.rb tallies)
with an estimator another engine can replay bit-for-bit.
"""

import collections

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import sketches


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hll-tests", master="local[4]",
                    shuffle_partitions=8)


def _truth(rows):
    t = collections.defaultdict(set)
    for g, v in rows:
        t[g].add(v)
    return {g: len(s) for g, s in t.items()}


def test_rho_spot_values(spark):
    """rho = leading-zero run of the low 26 hash bits + 1, computed via
    length(bin(w)) — pinned against a pure-Python replay of the same
    two-round hash."""
    vals = [(1, v) for v in range(200)]
    df = spark.createDataFrame(vals, "g int, v bigint")
    regs = {r.idx: r.rho
            for r in sketches.hll_registers(df, "g", "v").collect()}

    def py_hash(v):
        h = ((v % 2147483648) * 2654435761) % 4294967296
        h = (h ^ (h >> 16)) % 4294967296
        h = ((h % 2147483648) * 2246822519) % 4294967296
        return (h ^ (h >> 15)) % 4294967296

    want = {}
    for _, v in vals:
        h = py_hash(v)
        idx, w = h // (1 << 26), h % (1 << 26)
        rho = 27 if w == 0 else 27 - w.bit_length()
        want[idx] = max(want.get(idx, 0), rho)
    assert regs == want


def test_small_groups_linear_counting(spark):
    """Tiny cardinalities route through the constant linear-counting
    table and land exact or ±1 (the table is the rounded ln — for
    V=63 empty registers it answers exactly 1, etc.)."""
    rows = [(1, 7), (1, 7), (1, 7)] + [(2, v) for v in range(8)]
    df = spark.createDataFrame(rows, "g int, v bigint")
    out = {r.g: r.est_distinct
           for r in sketches.hll_distinct(df, "g", "v").collect()}
    assert out[1] == 1
    assert abs(out[2] - 8) <= 1


def test_estimator_accuracy(spark):
    """Planted cardinalities across three orders of magnitude: the
    m=64 estimate must land within 2σ ≈ 26% of truth on every group
    (deterministic — one fixed hash, a regression pin)."""
    rows = [(g, g * 1_000_003 + i * 17)
            for g, n in ((1, 500), (2, 2000), (3, 8000), (4, 40000))
            for i in range(n)]
    df = spark.createDataFrame(rows, "g int, v bigint")
    out = {r.g: r.est_distinct
           for r in sketches.hll_distinct(df, "g", "v").collect()}
    for g, n in ((1, 500), (2, 2000), (3, 8000), (4, 40000)):
        assert abs(out[g] - n) / n < 0.26, (g, n, out[g])


def test_duplicates_are_free(spark):
    """HLL's defining property vs KMV: duplicating every row leaves
    every register — and therefore the estimate — bit-identical."""
    base = [(1, (v * 37) % 5000) for v in range(3000)]
    df1 = spark.createDataFrame(base, "g int, v bigint")
    df8 = spark.createDataFrame(base * 8, "g int, v bigint")
    one = sorted(map(tuple, sketches.hll_distinct(df1, "g", "v").collect()))
    eight = sorted(map(tuple, sketches.hll_distinct(df8, "g", "v").collect()))
    assert one == eight


def test_duckdb_twin_matches(spark):
    rows = [(g % 5, (g * 7919 + i * 13) % 100000)
            for g in range(5) for i in range(g * 300 + 50)]
    rows += [(9, v) for v in (1, 2, 3, 2, 1)]  # linear-counting group
    df = spark.createDataFrame(rows, "g int, v bigint")
    got = sorted(map(tuple, sketches.hll_distinct(df, "g", "v").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        sketches.hll_distinct_sql("t", "g", "v")).fetchall()))
    assert got == want


def test_registers_merge_by_max(spark):
    """Union-then-estimate == estimate-of-union: sketch two
    overlapping halves separately, merge the register sets with a
    MAX re-aggregate, and the estimate equals sketching the whole."""
    vals = [v * 37 + 5 for v in range(4000)]
    half1 = [(1, v) for v in vals[:2500]]
    half2 = [(1, v) for v in vals[2000:]]
    whole = spark.createDataFrame(half1 + half2, "g int, v bigint")
    want = sorted(map(tuple,
                      sketches.hll_distinct(whole, "g", "v").collect()))

    r1 = sketches.hll_registers(
        spark.createDataFrame(half1, "g int, v bigint"), "g", "v")
    r2 = sketches.hll_registers(
        spark.createDataFrame(half2, "g int, v bigint"), "g", "v")
    merged = (
        r1.unionByName(r2)
        .groupBy("g", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    got = sorted(map(tuple,
                     sketches.hll_estimate(merged, "g").collect()))
    assert got == want


def test_plan_no_window_no_distinct(spark):
    """The scale claim: unlike KMV there must be NO window and NO
    distinct pre-shuffle — just partial/final hash aggregates, so
    per-group shuffle volume is ≤ 64 register rows."""
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("v"))
    plan = sketches.hll_distinct(df, "g", "v")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max" in plan  # map-side register combine

"""KMV distinct-cardinality sketch (operators/sketches.py)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import sketches


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("sketch-tests", master="local[4]",
                    shuffle_partitions=8)


def test_small_groups_are_exact(spark):
    rows = [("g1", v) for v in (10, 20, 20, 30)] + \
           [("g2", v) for v in range(7)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {r.g: r for r in sketches.kmv_distinct(
        df, "g", "v", k=64).collect()}
    assert out["g1"].est_distinct == 3  # duplicates collapse
    assert out["g2"].est_distinct == 7
    assert out["g1"].n_kept == 3


def test_estimator_accuracy_at_k64(spark):
    """Planted cardinalities 500 / 2000 / 8000: the k=64 estimate must
    land within 3/√k ≈ 37% of truth (deterministic — one fixed hash,
    so this is a regression pin, not a flaky statistical test)."""
    rows = [(g, g * 1_000_003 + i * 17)
            for g, n in ((1, 500), (2, 2000), (3, 8000))
            for i in range(n)]
    df = spark.createDataFrame(rows, "g int, v bigint")
    out = {r.g: r.est_distinct
           for r in sketches.kmv_distinct(df, "g", "v", k=64).collect()}
    for g, n in ((1, 500), (2, 2000), (3, 8000)):
        assert abs(out[g] - n) / n < 0.37, (g, n, out[g])


def test_duckdb_twin_matches(spark):
    rows = [(g % 5, (g * 7919 + i * 13) % 100000)
            for g in range(5) for i in range(g * 300 + 50)]
    df = spark.createDataFrame(rows, "g int, v bigint")
    got = sorted(map(tuple,
                     sketches.kmv_distinct(df, "g", "v", k=32).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        sketches.kmv_distinct_sql("t", "g", "v", k=32)).fetchall()))
    assert got == want


def test_sketch_is_mergeable(spark):
    """Union-then-resketch == sketch-of-union: feeding two halves of a
    group through the operator separately, merging the kept hash sets,
    and re-taking the bottom k reproduces the whole-group sketch."""
    vals = [v * 37 + 5 for v in range(4000)]
    half1 = [(1, v) for v in vals[:2500]]
    half2 = [(1, v) for v in vals[2000:]]  # overlap on purpose
    whole = spark.createDataFrame(half1 + half2, "g int, v bigint")
    k = 48
    want = sketches.kmv_distinct(whole, "g", "v", k=k).collect()[0]

    def kept_hashes(rows):
        df = spark.createDataFrame(rows, "g int, v bigint")
        hs = df.select(sketches.kmv_hash(F.col("v")).alias("h")) \
               .distinct().orderBy("h").limit(k).collect()
        return [r.h for r in hs]

    merged = sorted(set(kept_hashes(half1)) | set(kept_hashes(half2)))[:k]
    kth = merged[-1]
    est = (k - 1) * 4_294_967_296 // max(kth, 1)
    assert est == want.est_distinct
    assert kth == want.kth_hash


def test_k_validated(spark):
    df = spark.createDataFrame([(1, 1)], "g int, v bigint")
    with pytest.raises(ValueError):
        sketches.kmv_distinct(df, "g", "v", k=1)


def test_window_group_limit_plan(spark):
    """The scale claim: the per-group bottom-k must plan as
    WindowGroupLimit (partial top-k before the shuffle)."""
    df = spark.createDataFrame([(1, 1)], "g int, v bigint")
    plan = (
        sketches.kmv_distinct(df, "g", "v", k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan

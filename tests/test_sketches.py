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


def test_countmin_one_sided_and_exact_on_sparse(spark):
    """est ≥ true always; with far fewer distinct tokens than buckets
    and 4 rows, collisions are absent and every estimate is EXACT."""
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d d d d")],
        "doc_id int, text string",
    )
    sk = sketches.countmin_build(docs, depth=4, width=1024)
    q = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("zz",)], "token string")
    est = {r.token: r.est_n for r in
           sketches.countmin_estimate(sk, q, width=1024).collect()}
    # the sketch stores only POPULATED cells; an unseen token either
    # joins nothing (absent ≡ 0, the case here) or lands on a
    # collision cell (est > 0 — still one-sided-legal for true = 0)
    assert {k: v for k, v in est.items() if k != "zz"} == {
        "a": 4, "b": 3, "c": 1, "d": 4}
    assert est.get("zz", 0) >= 0


def test_countmin_overcount_bounded_under_pressure(spark):
    """Tiny width forces collisions: estimates stay ≥ true and within
    the deterministic measured bound (fixed hashes → regression pin)."""
    import random
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(200)]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab) for _ in range(100)))
         for i in range(30)],
        "doc_id int, text string",
    )
    truth = {}
    for _, t in docs.collect():
        for w in t.split():
            truth[w] = truth.get(w, 0) + 1
    sk = sketches.countmin_build(docs, depth=4, width=64)
    q = spark.createDataFrame([(w,) for w in vocab], "token string")
    est = {r.token: r.est_n for r in
           sketches.countmin_estimate(sk, q, width=64).collect()}
    n_total = sum(truth.values())
    for w in vocab:
        assert est[w] >= truth.get(w, 0), w
        # e·N/width bound with huge slack (deterministic anyway)
        assert est[w] - truth.get(w, 0) <= 3 * n_total // 64, w


def test_countmin_sketch_is_mergeable(spark):
    """Cell-wise ADD of two halves == sketch of the union."""
    from pyspark.sql import functions as FF
    half1 = spark.createDataFrame([(1, "x y z x")], "doc_id int, text string")
    half2 = spark.createDataFrame([(2, "x w w")], "doc_id int, text string")
    whole = half1.unionByName(half2)
    sk_w = {(r.row, r.bucket): r.cnt for r in
            sketches.countmin_build(whole, 3, 128).collect()}
    merged = (
        sketches.countmin_build(half1, 3, 128)
        .unionByName(sketches.countmin_build(half2, 3, 128))
        .groupBy("row", "bucket").agg(FF.sum("cnt").alias("cnt"))
    )
    sk_m = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    assert sk_m == sk_w


def test_countmin_duckdb_twin(spark):
    import duckdb as ddb
    import random
    rng = random.Random(9)
    rows = [(i, " ".join(rng.choice(["aa", "bb", "cc", "dd", "ee"])
                         for _ in range(40))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    sk = sketches.countmin_build(docs, depth=3, width=32)
    q = spark.createDataFrame(
        [("aa",), ("bb",), ("ee",)], "token string")
    got = sorted(map(tuple, sketches.countmin_estimate(
        sk, q, width=32).collect()))
    con = ddb.connect()
    con.execute("CREATE TABLE documents6(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents6 VALUES (?, ?)", rows)
    con.execute("CREATE TABLE qt(token VARCHAR)")
    con.executemany("INSERT INTO qt VALUES (?)",
                    [("aa",), ("bb",), ("ee",)])
    want = sorted(map(tuple, con.execute(sketches.countmin_sql(
        "documents6", "SELECT token FROM qt", depth=3, width=32
    )).fetchall()))
    assert got == want

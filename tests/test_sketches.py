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


def test_sampled_quantiles_exact_below_k(spark):
    """Groups smaller than k: the 'sample' is the whole group, so the
    quantiles are EXACT lower-convention order statistics."""
    rows = [(1, v, 100 + i) for i, v in enumerate([10, 20, 30, 40, 50])]
    df = spark.createDataFrame(rows, "g int, v bigint, key bigint")
    out = {r.q_pct: r.value for r in sketches.sampled_quantiles(
        df, "g", "v", "key", k=64, qs=(0.0, 0.25, 0.5, 1.0)).collect()}
    # n=5: idx = floor(q·4) → 0,1,2,4
    assert out == {0: 10, 2500: 20, 5000: 30, 10000: 50}


def test_sampled_quantiles_accuracy_on_uniform(spark):
    """10k uniform values, k=256: sampled median within 10% of true
    (deterministic hash ⇒ a regression pin, not a flaky test)."""
    rows = [(1, (i * 7919) % 10000, i) for i in range(10000)]
    df = spark.createDataFrame(rows, "g int, v bigint, key bigint")
    out = {r.q_pct: r.value for r in sketches.sampled_quantiles(
        df, "g", "v", "key", k=256).collect()}
    assert abs(out[5000] - 5000) < 1000, out
    assert abs(out[9000] - 9000) < 1000, out


def test_sampled_quantiles_merge_property(spark):
    """Union of two halves' bottom-k samples, re-cut to k, gives the
    whole's sketch — the same merge contract as kmv_distinct."""
    from pyspark.sql import functions as FF
    rows = [(1, (i * 13) % 5000, i) for i in range(4000)]
    df = spark.createDataFrame(rows, "g int, v bigint, key bigint")
    whole = {r.q_pct: r.value for r in sketches.sampled_quantiles(
        df, "g", "v", "key", k=64).collect()}

    def bottomk(part):
        return (part.select("g", "v", "key",
                            sketches.kmv_hash(FF.col("key")).alias("h"))
                .orderBy("h", "key").limit(64))

    h1 = bottomk(df.where(FF.col("key") < 2000))
    h2 = bottomk(df.where(FF.col("key") >= 2000))
    merged = h1.unionByName(h2).orderBy("h", "key").limit(64) \
        .drop("h")
    re = {r.q_pct: r.value for r in sketches.sampled_quantiles(
        merged, "g", "v", "key", k=64).collect()}
    assert re == whole


def test_sampled_quantiles_duckdb_twin(spark):
    rows = [((i * 3) % 4, (i * 104729) % 1000, i) for i in range(800)]
    df = spark.createDataFrame(rows, "g int, v bigint, key bigint")
    got = sorted(map(tuple, sketches.sampled_quantiles(
        df, "g", "v", "key", k=32).collect()))
    import duckdb as ddb
    con = ddb.connect()
    con.execute("CREATE TABLE t2(g INT, v BIGINT, key BIGINT)")
    con.executemany("INSERT INTO t2 VALUES (?,?,?)", rows)
    want = sorted(map(tuple, con.execute(sketches.sampled_quantiles_sql(
        "t2", "g", "v", "key", k=32)).fetchall()))
    assert got == want


def test_sampled_quantiles_windowgrouplimit_plan(spark):
    df = spark.createDataFrame([(1, 1, 1)], "g int, v bigint, key bigint")
    plan = (
        sketches.sampled_quantiles(df, "g", "v", "key", k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan

"""Bucket-decomposed interval joins (operators/temporal.py).

The operator's claim is semantic equivalence to the naive range join
with an equi-join physical plan: points/intervals meet on (key, time
bucket), the range predicate is residual, and the first-shared-bucket
rule makes each overlap pair appear exactly once with no distinct()
pass.  Tests check the semantics against brute force over randomized
inputs (boundaries included), the no-silent-blowup guard, and the plan
shape (hash join, no nested loop)."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("interval-join-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


BASE = dt.datetime(2024, 3, 1)


def _t(seconds):
    return BASE + dt.timedelta(seconds=seconds)


def _points_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp"
    )


def _intervals_df(spark, rows, prefix="w"):
    return spark.createDataFrame(
        rows,
        f"user_id bigint, {prefix}_id bigint, "
        f"{prefix}_start timestamp, {prefix}_end timestamp",
    )


def test_interval_join_boundaries(spark):
    """start is inclusive, end is exclusive — including when the
    boundary falls exactly on a bucket edge (bucket_s divides it)."""
    pts = _points_df(
        spark,
        [(1, 0, _t(100)), (1, 1, _t(199)), (1, 2, _t(200)), (1, 3, _t(99))],
    )
    iv = _intervals_df(spark, [(1, 10, _t(100), _t(200))])
    for w in (10, 33, 1000):  # 10 divides both edges; 33 neither
        got = sorted(
            r.event_id
            for r in temporal.interval_join(
                pts, iv, "user_id", "ts", "w_start", "w_end", bucket_s=w
            ).collect()
        )
        assert got == [0, 1], w


def test_interval_join_randomized_vs_bruteforce(spark):
    rng = random.Random(11)
    pts = [(rng.randint(0, 9), i, _t(rng.randint(0, 2000))) for i in range(300)]
    ivs = []
    for j in range(80):
        s = rng.randint(0, 2000)
        ivs.append((rng.randint(0, 9), j, _t(s), _t(s + rng.randint(0, 400))))
    for w in (7, 60, 500):
        got = sorted(
            (r.event_id, r.w_id)
            for r in temporal.interval_join(
                _points_df(spark, pts),
                _intervals_df(spark, ivs),
                "user_id", "ts", "w_start", "w_end", bucket_s=w,
            ).collect()
        )
        want = sorted(
            (eid, wid)
            for (pk, eid, ts) in pts
            for (ik, wid, s, e) in ivs
            if pk == ik and s <= ts < e
        )
        assert got == want, w


def test_interval_join_degenerate_intervals_match_nothing(spark):
    pts = _points_df(spark, [(1, 0, _t(50))])
    iv = _intervals_df(
        spark, [(1, 1, _t(50), _t(50)), (1, 2, _t(60), _t(40))]
    )
    assert (
        temporal.interval_join(
            pts, iv, "user_id", "ts", "w_start", "w_end", bucket_s=10
        ).count()
        == 0
    )


def test_interval_overlap_randomized_exactly_once(spark):
    """Overlap pairs equal brute force AND each pair appears exactly
    once (the first-shared-bucket rule, not a distinct)."""
    rng = random.Random(23)

    def mk(n, prefix):
        rows = []
        for j in range(n):
            s = rng.randint(0, 1500)
            rows.append(
                (rng.randint(0, 5), j, _t(s), _t(s + rng.randint(1, 600)))
            )
        return rows

    arows, brows = mk(60, "a"), mk(60, "b")
    for w in (13, 120, 2000):
        got = [
            (r.a_id, r.b_id)
            for r in temporal.interval_overlap_join(
                _intervals_df(spark, arows, "a"),
                _intervals_df(spark, brows, "b"),
                "user_id", "a_start", "a_end", "b_start", "b_end",
                bucket_s=w,
            ).collect()
        ]
        want = sorted(
            (ai, bi)
            for (ak, ai, as_, ae) in arows
            for (bk, bi, bs, be) in brows
            if ak == bk and as_ < be and bs < ae
        )
        assert sorted(got) == want, w
        assert len(got) == len(set(got)), w  # exactly once


def test_interval_overlap_touching_is_not_overlap(spark):
    a = _intervals_df(spark, [(1, 0, _t(0), _t(100))], "a")
    b = _intervals_df(spark, [(1, 0, _t(100), _t(200))], "b")
    assert (
        temporal.interval_overlap_join(
            a, b, "user_id", "a_start", "a_end", "b_start", "b_end",
            bucket_s=50,
        ).count()
        == 0
    )


def test_interval_join_bucket_cap_raises(spark):
    """The no-silent-blowup guard: a pathological open-ended interval
    fails the job with an explicit error instead of exploding to
    millions of bucket rows."""
    pts = _points_df(spark, [(1, 0, _t(50))])
    iv = _intervals_df(spark, [(1, 1, _t(0), _t(10_000_000))])
    out = temporal.interval_join(
        pts, iv, "user_id", "ts", "w_start", "w_end",
        bucket_s=60, max_buckets_per_interval=1000,
    )
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        out.count()
    # same data under a sane cap-free call still works (bounded here)
    assert (
        temporal.interval_join(
            pts, iv, "user_id", "ts", "w_start", "w_end",
            bucket_s=60,
        ).count()
        == 1
    )


def test_interval_join_column_collision_raises(spark):
    pts = _points_df(spark, [(1, 0, _t(50))])
    iv = pts.withColumnRenamed("ts", "w_start").withColumn(
        "w_end", F.col("w_start")
    )
    with pytest.raises(ValueError, match="share columns"):
        temporal.interval_join(
            pts, iv, "user_id", "ts", "w_start", "w_end", bucket_s=10
        )


def test_interval_join_stream_static(spark, tmp_path):
    """The bucket decomposition is a plain equi-join, so it runs
    unchanged as a Structured Streaming stream-static join (no range
    condition, which stream-static inner joins would reject into a
    nested loop): streaming points vs static interval table, append
    mode, equals the batch run over the same files."""
    src = str(tmp_path / "pts")
    schema = "user_id bigint, event_id bigint, ts timestamp"
    rows1 = [(1, i, _t(40 * i)) for i in range(10)]
    rows2 = [(2, 100 + i, _t(35 * i)) for i in range(10)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    windows = _intervals_df(
        spark, [(1, 10, _t(50), _t(200)), (2, 20, _t(100), _t(260))]
    )

    def join(points):
        return temporal.interval_join(
            points, windows, "user_id", "ts", "w_start", "w_end",
            bucket_s=60,
        ).select("user_id", "event_id", "w_id")

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        join(stream)
        .writeStream.format("memory")
        .queryName("ij_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_id, r.w_id)
        for r in spark.sql("SELECT * FROM ij_stream_test").collect()
    }
    want = {
        (r.user_id, r.event_id, r.w_id)
        for r in join(spark.read.parquet(src)).collect()
    }
    assert got == want and len(want) > 0


def test_interval_join_plan_is_equi_join(spark):
    """The point of the decomposition: Catalyst must plan a hash
    equi-join on (key, bucket) — never a nested-loop/cartesian."""
    pts = _points_df(spark, [(1, 0, _t(50))])
    iv = _intervals_df(spark, [(1, 1, _t(0), _t(100))])
    for out in (
        temporal.interval_join(
            pts, iv, "user_id", "ts", "w_start", "w_end", bucket_s=10
        ),
        temporal.interval_overlap_join(
            _intervals_df(spark, [(1, 0, _t(0), _t(100))], "a"),
            _intervals_df(spark, [(1, 0, _t(50), _t(150))], "b"),
            "user_id", "a_start", "a_end", "b_start", "b_end", bucket_s=10,
        ),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
        assert "Join" in plan, plan

"""Allen interval algebra (operators/temporal.py allen_classify).

All 11 touch-or-intersect Allen relations from one bucketed join —
closed-end bucket coverage so `meets` survives a touch exactly on a
bucket edge, first-shared-bucket dedup, loud degenerate guard.
"""

import datetime

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal

E = datetime.datetime(2024, 1, 1)


def ts(s):
    return E + datetime.timedelta(seconds=s)


PLANTS = [
    ("equals", (0, 10), (0, 10)),
    ("starts", (0, 5), (0, 10)),
    ("started_by", (0, 10), (0, 5)),
    ("finishes", (5, 10), (0, 10)),
    ("finished_by", (0, 10), (5, 10)),
    ("during", (3, 7), (0, 10)),
    ("contains", (0, 10), (3, 7)),
    # touch EXACTLY on a bucket edge (W=3600) — the case half-open
    # bucket coverage silently drops
    ("meets", (0, 3600), (3600, 7200)),
    ("met_by", (3600, 7200), (0, 3600)),
    ("overlaps", (0, 6), (4, 10)),
    ("overlapped_by", (4, 10), (0, 6)),
]


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("allen-tests", master="local[4]",
                    shuffle_partitions=8)


def _tables(spark, extra_a=(), extra_b=()):
    arows, brows = [], []
    for i, (rel, (a0, a1), (b0, b1)) in enumerate(PLANTS):
        arows.append((i, i, ts(a0), ts(a1)))
        brows.append((i, 100 + i, ts(b0), ts(b1)))
    arows += list(extra_a)
    brows += list(extra_b)
    a = spark.createDataFrame(
        arows, "k bigint, a_id bigint, a_start timestamp, a_end timestamp")
    b = spark.createDataFrame(
        brows, "k bigint, b_id bigint, b_start timestamp, b_end timestamp")
    return a, b, arows, brows


def _run(a, b, **kw):
    kw.setdefault("bucket_s", 3600)
    kw.setdefault("max_buckets_per_interval", 64)
    return temporal.allen_classify(
        a, b, "k", "a_start", "a_end", "b_start", "b_end", **kw)


def test_all_eleven_relations(spark):
    a, b, _, _ = _tables(
        spark,
        extra_a=[(99, 99, ts(0), ts(10))],     # strictly disjoint pair:
        extra_b=[(99, 199, ts(20), ts(30))],   # before/after NOT emitted
    )
    got = {r.k: r.relation for r in _run(a, b).collect()}
    for i, (rel, _, _) in enumerate(PLANTS):
        assert got[i] == rel, (i, rel, got.get(i))
    assert 99 not in got
    assert set(got.values()) == set(temporal.ALLEN_RELATIONS)


def test_exactly_once_across_buckets(spark):
    """A long overlap spanning many shared buckets emits ONE row
    (first-shared-bucket residual, no distinct)."""
    a = spark.createDataFrame(
        [(1, 1, ts(0), ts(36000))],
        "k bigint, a_id bigint, a_start timestamp, a_end timestamp")
    b = spark.createDataFrame(
        [(1, 2, ts(1800), ts(30000))],
        "k bigint, b_id bigint, b_start timestamp, b_end timestamp")
    out = _run(a, b).collect()
    assert len(out) == 1 and out[0].relation == "contains"


def test_degenerate_interval_raises(spark):
    a = spark.createDataFrame(
        [(1, 1, ts(5), ts(5))],
        "k bigint, a_id bigint, a_start timestamp, a_end timestamp")
    b = spark.createDataFrame(
        [(1, 2, ts(0), ts(10))],
        "k bigint, b_id bigint, b_start timestamp, b_end timestamp")
    with pytest.raises(Exception, match="degenerate"):
        _run(a, b).collect()


def test_bucket_blowup_raises(spark):
    a = spark.createDataFrame(
        [(1, 1, ts(0), ts(3600 * 100))],
        "k bigint, a_id bigint, a_start timestamp, a_end timestamp")
    b = spark.createDataFrame(
        [(1, 2, ts(0), ts(10))],
        "k bigint, b_id bigint, b_start timestamp, b_end timestamp")
    with pytest.raises(Exception, match="max_buckets"):
        _run(a, b, max_buckets_per_interval=8).collect()


def test_duckdb_twin_matches(spark):
    a, b, arows, brows = _tables(
        spark,
        extra_a=[(50 + i, 500 + i, ts(i * 7), ts(i * 7 + 20 + i))
                 for i in range(20)],
        extra_b=[(50 + i, 600 + i, ts(i * 5 + 3), ts(i * 5 + 40))
                 for i in range(20)],
    )
    got = sorted((r.a_id, r.b_id, r.relation) for r in _run(a, b).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE ta(k BIGINT, a_id BIGINT, "
                "a_start TIMESTAMP, a_end TIMESTAMP)")
    con.execute("CREATE TABLE tb(k BIGINT, b_id BIGINT, "
                "b_start TIMESTAMP, b_end TIMESTAMP)")
    con.executemany("INSERT INTO ta VALUES (?,?,?,?)", arows)
    con.executemany("INSERT INTO tb VALUES (?,?,?,?)", brows)
    sql = temporal.allen_classify_sql(
        "SELECT * FROM ta", "SELECT * FROM tb",
        "k", "a_start", "a_end", "b_start", "b_end")
    want = sorted(map(tuple, con.execute(
        f"SELECT a_id, b_id, relation FROM ({sql})").fetchall()))
    assert got == want


def test_plan_is_bucket_equijoin(spark):
    """The join must be a (key, bucket) hash equi-join — never a
    broadcast-nested-loop range join."""
    a, b, _, _ = _tables(spark)
    plan = _run(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

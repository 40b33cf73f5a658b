"""Data-quality suite (profile.dq_checks) — planted violations per
check kind, NULL conventions, full-blast-radius unique counting,
single-scan plan for scalar checks, random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import profile


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("dq-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "id long, k long, status string, price long"

SUITE = [
    ("not_null", "k"),
    ("range", "price", 0, 100),
    ("accepted", "status", ["O", "F"]),
    ("unique", ("id",)),
    ("subset", "k", ("dim", "dk")),
]


def _run(spark, rows, dim_rows):
    df = spark.createDataFrame(rows, SCHEMA)
    dim = spark.createDataFrame([(d,) for d in dim_rows], "dk long")
    out = profile.dq_checks(df, SUITE, refs={"dim": dim}).collect()
    return [(r.check_id, r.check_type, r.n_rows, r.n_violations,
             r.passed) for r in out]


def _mirror(rows, dim_rows):
    n = len(rows)
    nn = sum(1 for r in rows if r[1] is None)
    rng = sum(1 for r in rows
              if r[3] is not None and not (0 <= r[3] <= 100))
    acc = sum(1 for r in rows
              if r[2] is not None and r[2] not in ("O", "F"))
    from collections import Counter

    cnt = Counter(r[0] for r in rows)
    uniq = sum(c for c in cnt.values() if c > 1)
    dims = set(dim_rows)
    sub = sum(1 for r in rows if r[1] is not None and r[1] not in dims)
    vals = [nn, rng, acc, uniq, sub]
    kinds = ["not_null", "range", "accepted", "unique", "subset"]
    return [(i, kinds[i], n, v, v == 0) for i, v in enumerate(vals)]


def test_planted_violations(spark):
    rows = [
        (1, 10, "O", 50),
        (1, None, "F", 150),   # dup id, null k, price out of range
        (2, 99, "X", -1),      # k not in dim, bad status, bad price
        (3, 11, "O", 0),
    ]
    got = _run(spark, rows, [10, 11])
    assert got == [
        (0, "not_null", 4, 1, False),
        (1, "range", 4, 2, False),
        (2, "accepted", 4, 1, False),
        (3, "unique", 4, 2, False),   # BOTH dup rows count
        (4, "subset", 4, 1, False),
    ]


def test_all_green(spark):
    rows = [(1, 10, "O", 5), (2, 11, "F", 100)]
    got = _run(spark, rows, [10, 11])
    assert all(p for *_, p in got)


def test_null_conventions(spark):
    # NULL price is NOT a range violation; NULL status not an
    # accepted violation; NULL k not a subset violation — the nulls
    # belong to not_null checks by design.
    rows = [(1, None, None, None)]
    got = _run(spark, rows, [])
    assert got[1][3] == 0 and got[2][3] == 0 and got[4][3] == 0
    assert got[0][3] == 1


def test_scalar_checks_share_one_scan(spark):
    rows = [(i, i, "O", i % 50) for i in range(100)]
    df = spark.createDataFrame(rows, SCHEMA)
    scalars = [c for c in SUITE if c[0] in
               ("not_null", "range", "accepted")]
    plan = profile.dq_checks(df, scalars)._jdf.queryExecution() \
        .executedPlan().toString()
    # one aggregate over the base data feeding three constant rows:
    # the scan appears once (Union of projections over ONE agg)
    assert plan.count("Scan ExistingRDD") == 1


def test_guards(spark):
    with pytest.raises(ValueError, match="empty suite"):
        profile.dq_checks(None, [])
    with pytest.raises(ValueError, match="unknown check kind"):
        profile.dq_checks(None, [("frobnicate", "x")])
    with pytest.raises(ValueError, match="unknown table"):
        profile.dq_checks(None, [("subset", "k", ("nope", "x"))])


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(2024)
    rows = [
        (rng.randrange(150),
         rng.choice([None] + list(range(20))),
         rng.choice([None, "O", "F", "P"]),
         rng.choice([None, -5, 0, 50, 100, 101]))
        for _ in range(200)
    ]
    dim_rows = list(range(15))
    got = _run(spark, rows, dim_rows)
    assert got == _mirror(rows, dim_rows)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(id BIGINT, k BIGINT, status VARCHAR, "
        "price BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    con.execute("CREATE TABLE dim(dk BIGINT)")
    con.executemany("INSERT INTO dim VALUES (?)",
                    [(d,) for d in dim_rows])
    out = con.execute(profile.dq_checks_sql(
        "t", SUITE, refs={"dim": "dim"}
    )).fetchall()
    assert [(r[0], r[1], r[3], r[4], r[5]) for r in out] == got

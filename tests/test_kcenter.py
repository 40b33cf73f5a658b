"""Farthest-first k-center seeding (similarity.kcenter_seeds) —
hand-placed clusters (one seed lands in each), tie-breaks, coverage
radius monotonicity, guards, random ≡ Python mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("kcenter-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "vec_id long, embedding array<float>"


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, SCHEMA)
    out = similarity.kcenter_seeds(df, k).collect()
    return [(r.seed_rank, r.vec_id, r.dist_q) for r in out]


def _mirror(rows, k, scale=10**6):
    qs = {i: [round(v * scale) for v in vec] for i, vec in rows}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(qs[a], qs[b]))

    first = min(qs)
    chosen = [(0, first, None)]
    mind = {i: d2(i, first) for i in qs}
    for t in range(1, k):
        pid = max(mind, key=lambda i: (mind[i], -i))
        chosen.append((t, pid, mind[pid]))
        if t < k - 1:
            for i in qs:
                mind[i] = min(mind[i], d2(i, pid))
    return chosen


def test_one_seed_per_cluster(spark):
    # three tight clusters far apart: the three seeds must cover all
    # three clusters, never two from one
    rows = []
    for cid, base in enumerate([0.0, 0.5, -0.5]):
        for j in range(5):
            rows.append((cid * 10 + j,
                         [base + j * 1e-4, base - j * 1e-4]))
    got = _run(spark, rows, 3)
    assert {r[1] // 10 for r in got} == {0, 1, 2}
    # seed 0 is the min id by contract
    assert got[0] == (0, 0, None)


def test_coverage_radius_monotone(spark):
    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1), rng.uniform(-1, 1)])
            for i in range(30)]
    got = _run(spark, rows, 6)
    radii = [d for _, _, d in got[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_tie_break_smallest_id(spark):
    # two identical farthest candidates → smaller id wins
    rows = [(0, [0.0, 0.0]), (5, [1.0, 0.0]), (3, [1.0, 0.0])]
    got = _run(spark, rows, 2)
    assert got[1][1] == 3


def test_guards(spark):
    with pytest.raises(ValueError, match="k must"):
        similarity.kcenter_seeds(None, 1)
    df = spark.createDataFrame([(1, [0.0])], SCHEMA)
    with pytest.raises(ValueError, match="exceeds corpus"):
        similarity.kcenter_seeds(df, 5)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(77)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(50)
    ]
    got = _run(spark, rows, 5)
    assert got == _mirror(rows, 5)
    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    out = con.execute(similarity.kcenter_seeds_sql("e", 5)).fetchall()
    assert [tuple(r) for r in out] == got

"""Quantized embedding centroids (similarity.embedding_centroids)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("centroid-tests", master="local[4]",
                    shuffle_partitions=8)


def test_planted_means_with_negative_truncation(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, -0.5], 0),
            (2, [0.0, -0.25], 0),
            (3, [0.5, 0.5], 1),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = {(r.label, r.dim): r for r in
           similarity.embedding_centroids(emb).collect()}
    assert out[(0, 0)].mean_q == 500_000          # (1e6 + 0) / 2
    # (−500000 − 250000) = −750000; trunc(−750000/2) = −375000
    assert out[(0, 1)].mean_q == -375_000
    # odd negative sum: BOTH engines truncate toward zero, −3/2 → −1
    emb2 = spark.createDataFrame(
        [(1, [-0.000001], 0), (2, [-0.000002], 0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    r = similarity.embedding_centroids(emb2).collect()[0]
    assert r.mean_q == -1
    assert out[(1, 0)].n_vecs == 1


def test_duckdb_twin_matches(spark):
    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
            for i in range(200)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    got = sorted(map(tuple,
                     similarity.embedding_centroids(emb).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], "
        "label INT)")
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        similarity.embedding_centroids_sql("embeddings")).fetchall()))
    assert got == want


def test_single_aggregation_plan(spark):
    emb = spark.createDataFrame(
        [(1, [0.0], 0)], "vec_id bigint, embedding array<float>, label int")
    plan = (
        similarity.embedding_centroids(emb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_assignment_recovers_separated_clusters(spark):
    """Vectors generated around two well-separated prototypes with
    their true label: one M+E round must re-assign every vector to its
    own cluster."""
    import random as _r
    rng = _r.Random(11)
    rows = []
    protos = {0: [1.0, 0.0, 0.5], 1: [-1.0, 0.5, -0.5]}
    for i in range(200):
        lab = i % 2
        rows.append((
            i,
            [p + rng.uniform(-0.05, 0.05) for p in protos[lab]],
            lab,
        ))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    cents = similarity.embedding_centroids(emb)
    got = {r.vec_id: r.label for r in
           similarity.nearest_centroid_assign(emb, cents).collect()}
    assert got == {i: i % 2 for i in range(200)}


def test_assignment_duckdb_twin(spark):
    import random as _r
    rng = _r.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)], i % 4)
            for i in range(150)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    cents = similarity.embedding_centroids(emb)
    got = sorted(map(tuple,
                     similarity.nearest_centroid_assign(emb, cents)
                     .collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, "
                "embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        similarity.nearest_centroid_assign_sql("embeddings")).fetchall()))
    assert got == want


def test_assignment_broadcasts_centroids(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0], 0), (2, [1.0, 0.0], 1)],
        "vec_id bigint, embedding array<float>, label int")
    cents = similarity.embedding_centroids(emb)
    plan = (
        similarity.nearest_centroid_assign(emb, cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan

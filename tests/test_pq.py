"""Product-quantization encoding (similarity.pq_encode) — hand-
verifiable codebooks, ceil-split subvectors, reconstruction-error
sanity, and DuckDB twin parity on random float32 values (the
float32-promotion regime that bit the centroid op)."""

import random

import duckdb
import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("pq-tests", master="local[4]", shuffle_partitions=8)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def test_two_code_hand_case(spark):
    """Four 4-dim vectors, 2 codes seeded by parity: evens are all
    [0,0,1,1], odds all [1,1,0,0] — each codebook entry IS its class,
    so every vector encodes to its own seed with zero error."""
    rows = [
        (0, [0.0, 0.0, 1.0, 1.0]),
        (2, [0.0, 0.0, 1.0, 1.0]),
        (1, [1.0, 1.0, 0.0, 0.0]),
        (3, [1.0, 1.0, 0.0, 0.0]),
    ]
    out = similarity.pq_encode(_df(spark, rows), m=2, codes=2).collect()
    got = {(r.vec_id, r.sub): (r.code, r.dist_q) for r in out}
    assert len(got) == 8
    for vid, _ in rows:
        for sub in (0, 1):
            assert got[(vid, sub)] == (vid % 2, 0)


def test_subvector_ceil_split(spark):
    """D=5, m=2 → widths 3 and 2 (remainder in the last subvector)."""
    rows = [(0, [0.1] * 5), (1, [0.2] * 5)]
    out = similarity.pq_encode(_df(spark, rows), m=2, codes=2).collect()
    assert {r.sub for r in out} == {0, 1}
    assert len(out) == 4


def test_codes_bounded_and_error_nonneg(spark):
    rng = random.Random(2)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)
    ]
    out = similarity.pq_encode(_df(spark, rows), m=4, codes=5).collect()
    assert all(0 <= r.code < 5 for r in out)
    assert all(r.dist_q >= 0 for r in out)
    assert len(out) == 40 * 4


def test_duckdb_twin_parity_float32(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(12).astype(np.float32)])
        for i in range(50)
    ]
    got = sorted(
        tuple(r)
        for r in similarity.pq_encode(
            _df(spark, rows), m=3, codes=4
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            similarity.pq_encode_sql("embeddings", m=3, codes=4)
        ).fetchall()
    )
    assert got == twin

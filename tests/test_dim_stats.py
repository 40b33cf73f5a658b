"""Embedding dimension health profile (similarity.embedding_dim_stats)
— dead/constant dimension detection, negative-mean truncation, exact
variance, random ≡ Python mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("dimstats-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.embedding_dim_stats(df).collect()
    return {
        r.dim: (r.n_vecs, r.n_zero, r.n_distinct, r.mean_q,
                r.min_q, r.max_q, r.var_q2)
        for r in out
    }


def _mirror(vecs, scale=10**6):
    import numpy as np

    dims = {}
    for v in vecs:
        for d, x in enumerate(v):
            q = round(float(np.float32(x)) * scale)
            dims.setdefault(d, []).append(int(q))
    out = {}
    for d, qs in dims.items():
        n = len(qs)
        s, s2 = sum(qs), sum(q * q for q in qs)
        mean = -((-s) // n) if s < 0 else s // n
        out[d] = (n, sum(1 for q in qs if q == 0), len(set(qs)),
                  mean, min(qs), max(qs), (n * s2 - s * s) // (n * n))
    return out


def test_dead_and_constant_dims(spark):
    vecs = [[0.0, 0.5, 0.25], [0.0, 0.5, -0.25], [0.0, 0.5, 0.75]]
    got = _run(spark, vecs)
    assert got[0][1] == 3 and got[0][2] == 1 and got[0][6] == 0
    assert got[1][2] == 1 and got[1][6] == 0      # constant, not dead
    assert got[2][2] == 3 and got[2][6] > 0


def test_negative_mean_truncates_toward_zero(spark):
    vecs = [[-0.000001], [-0.000001], [0.000001]]
    # q = [-1, -1, 1]: s = -1, mean = trunc(-1/3) = 0
    got = _run(spark, vecs)
    assert got[0][3] == 0 and got[0][4] == -1 and got[0][5] == 1


def test_exact_variance(spark):
    vecs = [[0.000001], [0.000003]]  # q = 1, 3 → var = 1 q²
    got = _run(spark, vecs)
    assert got[0][6] == 1


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(246)
    vecs = [
        [rng.uniform(-1, 1) for _ in range(6)] for _ in range(80)
    ]
    # float32 round-trip like the parquet column would
    import numpy as np

    vecs = [[float(x) for x in np.array(v, dtype=np.float32)]
            for v in vecs]
    got = _run(spark, vecs)
    assert got == _mirror(vecs)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(vec_id BIGINT, embedding FLOAT[])")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
    )
    rows = con.execute(
        similarity.embedding_dim_stats_sql("t")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got

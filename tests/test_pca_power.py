"""Quantized power-iteration PCA (similarity.pca_power_top) — exact
big-int Python mirror of the recurrence, planted dominant-direction
recovery, constant-input loud failure, and DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("pca-tests", master="local[4]",
                    shuffle_partitions=8)


NORM = similarity.PCA_NORM


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _python_pca(vecs, scale=10**6, rounds=4):
    """vecs: list of float lists — exact integer mirror."""
    n, d = len(vecs), len(vecs[0])
    q = [[round(v * scale) for v in row] for row in vecs]
    mq = [_trunc_div(sum(row[j] for row in q), n) for j in range(d)]
    y = [[row[j] - mq[j] for j in range(d)] for row in q]
    v = [NORM] * d
    for _ in range(rounds):
        dots = [sum(yi[j] * v[j] for j in range(d)) for yi in y]
        c = [
            sum(dots[i] * y[i][j] for i in range(n)) for j in range(d)
        ]
        l1 = sum(abs(x) for x in c)
        assert l1 > 0
        v = [_trunc_div(x * NORM, l1) for x in c]
    return v


def _spark_pca(spark, vecs, rounds=4):
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    out = similarity.pca_power_top(df, rounds=rounds).collect()
    got = {r["dim"]: r["v_q"] for r in out}
    return [got[j] for j in sorted(got)]


def _gen(rng, n, d, direction, noise):
    out = []
    for _ in range(n):
        t = rng.uniform(-1, 1)
        out.append([
            max(-1.0, min(1.0, t * direction[j]
                          + rng.uniform(-noise, noise)))
            for j in range(d)
        ])
    return out


def test_matches_python_mirror(spark):
    rng = random.Random(11)
    vecs = _gen(rng, 40, 6, [0.8, 0.1, -0.4, 0.0, 0.2, 0.05], 0.05)
    assert _spark_pca(spark, vecs) == _python_pca(vecs)


def test_recovers_planted_direction(spark):
    """Variance planted along u: the quantized loadings align with u
    (cosine > 0.99 up to sign)."""
    rng = random.Random(12)
    u = [0.6, -0.3, 0.5, 0.1]
    vecs = _gen(rng, 200, 4, u, 0.02)
    v = _spark_pca(spark, vecs, rounds=8)
    dot = sum(a * b for a, b in zip(u, v))
    nu = sum(a * a for a in u) ** 0.5
    nv = sum(b * b for b in v) ** 0.5
    assert abs(dot) / (nu * nv) > 0.99


def test_constant_input_raises(spark):
    vecs = [[0.5, 0.5, 0.5]] * 10
    with pytest.raises(Exception, match="zero covariance"):
        _spark_pca(spark, vecs, rounds=1)


def test_guard_rounds(spark):
    df = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="rounds"):
        similarity.pca_power_top(df, rounds=0)


def test_vs_duckdb_twin(spark):
    rng = random.Random(13)
    vecs = _gen(rng, 60, 5, [0.2, 0.9, -0.1, 0.4, -0.6], 0.1)
    got = _spark_pca(spark, vecs)
    con = duckdb.connect()
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[])")
    con.executemany(
        "INSERT INTO emb VALUES (?, ?)",
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
    )
    sql = similarity.pca_power_top_sql("emb")
    twin = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert [twin[j] for j in sorted(twin)] == got == _python_pca(vecs)

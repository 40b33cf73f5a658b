"""Gravity-model OD residuals (spatial.od_gravity_residuals) —
uniform matrix baseline, planted corridor, min_flows, a Python
mirror, and DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("gravity-tests", master="local[4]",
                    shuffle_partitions=8)


def _python(flows, min_flows=1):
    from collections import Counter

    out_m, in_m = Counter(), Counter()
    tot = 0
    for o, d, n in flows:
        out_m[o] += n
        in_m[d] += n
        tot += n
    return {
        (o, d): (n, out_m[o], in_m[d],
                 n * tot * 10**6 // (out_m[o] * in_m[d]))
        for o, d, n in flows if n >= min_flows
    }


def _spark(spark, flows, **kw):
    df = spark.createDataFrame(
        flows, "cell_from long, cell_to long, n_flows long"
    )
    rows = spatial.od_gravity_residuals(df, **kw).collect()
    return {
        (r["cell_from"], r["cell_to"]):
            (r["n_flows"], r["out_o"], r["in_d"], r["ratio_ppm"])
        for r in rows
    }


def test_uniform_matrix_ratio_one(spark):
    """A fully uniform 3×3 matrix: every pair flows exactly as the
    gravity null predicts → ratio 10⁶ everywhere."""
    flows = [(o, d, 5) for o in range(3) for d in range(3)]
    got = _spark(spark, flows)
    assert all(v[3] == 1_000_000 for v in got.values())


def test_planted_corridor(spark):
    """A corridor pair carries double its gravity expectation; the
    displaced flows sit below 10⁶."""
    flows = [(o, d, 10) for o in range(3) for d in range(3)]
    flows = [(o, d, 40 if (o, d) == (0, 0) else n)
             for o, d, n in flows]
    got = _spark(spark, flows)
    assert got == _python(flows)
    assert got[(0, 0)][3] > 1_000_000
    assert got[(1, 1)][3] > got[(0, 1)][3]  # (0,1) shares the hot row


def test_min_flows(spark):
    flows = [(0, 0, 1), (0, 1, 5), (1, 0, 5), (1, 1, 5)]
    got = _spark(spark, flows, min_flows=2)
    assert (0, 0) not in got and len(got) == 3


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(949)
    seen = set()
    flows = []
    for _ in range(80):
        o, d = rng.randrange(8), rng.randrange(8)
        if (o, d) not in seen:
            seen.add((o, d))
            flows.append((o, d, rng.randrange(1, 50)))
    want = _python(flows)
    assert _spark(spark, flows) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE f (cell_from BIGINT, cell_to BIGINT,"
                " n_flows BIGINT)")
    con.executemany("INSERT INTO f VALUES (?,?,?)", flows)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            spatial.od_gravity_residuals_sql("f")
        ).fetchall()
    }
    assert got == want

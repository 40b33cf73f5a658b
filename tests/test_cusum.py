"""CUSUM change-point detection (temporal.cusum_split) — planted mean
shifts recovered exactly, earliest-k tie-break, negative values,
single-point keys absent, and random series vs a plain-Python mirror
and the DuckDB twin."""

import random
from datetime import datetime, timedelta

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("cusum-tests", master="local[4]",
                    shuffle_partitions=8)


T0 = datetime(2024, 3, 1)


def _rows(key, values):
    return [
        (key, T0 + timedelta(minutes=i), v) for i, v in enumerate(values)
    ]


def _python_cusum(values):
    n = len(values)
    if n < 2:
        return None
    sn = sum(values)
    best = None
    sk = 0
    for k in range(1, n):
        sk += values[k - 1]
        d = abs(n * sk - k * sn)
        if best is None or d > best[0]:
            best = (d, k, sk)
    d, k, sk = best
    return (
        n, k, T0 + timedelta(minutes=k - 1), d,
        int(sk * 1_000_000 / k) if sk >= 0
        else -(-sk * 1_000_000 // k),
        int((sn - sk) * 1_000_000 / (n - k)) if (sn - sk) >= 0
        else -(-(sn - sk) * 1_000_000 // (n - k)),
    )


def _spark_cusum(spark, rows):
    df = spark.createDataFrame(
        rows, "key bigint, ts timestamp, v bigint"
    )
    out = temporal.cusum_split(df, "key", "ts", "v").collect()
    return {
        r["key"]: (
            r["n"], r["split_k"], r["split_ts"], r["d_abs"],
            r["mean_before_ppm"], r["mean_after_ppm"],
        )
        for r in out
    }


def test_planted_step_recovered(spark):
    """10 points at 5 then 10 points at 50: the split lands exactly at
    k=10 with the exact segment means."""
    vals = [5] * 10 + [50] * 10
    got = _spark_cusum(spark, _rows(1, vals))[1]
    assert got[1] == 10
    assert got[4] == 5_000_000 and got[5] == 50_000_000
    assert got == _python_cusum(vals)


def test_tie_breaks_earliest(spark):
    """A symmetric series gives equal |D| at mirrored k — the earliest
    wins (deterministic at any parallelism)."""
    vals = [10, 0, 0, 10]   # D_1 = +20, D_2 = 0, D_3 = -20 → tie 1 vs 3
    got = _spark_cusum(spark, _rows(2, vals))[2]
    assert got[1] == 1
    assert got == _python_cusum(vals)


def test_negative_values_trunc_division(spark):
    """Negative segment sums exercise the trunc-toward-zero DIV on
    both engines (the documented DuckDB // semantics)."""
    vals = [-7, -7, -7, 2, 2]
    got = _spark_cusum(spark, _rows(3, vals))[3]
    assert got == _python_cusum(vals)
    assert got[4] == -7_000_000


def test_single_point_absent(spark):
    assert _spark_cusum(spark, _rows(4, [42])) == {}


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(808)
    rows, want = [], {}
    for key in range(8):
        n = rng.randrange(2, 60)
        vals = [rng.randrange(-50, 200) for _ in range(n)]
        rows += _rows(key, vals)
        want[key] = _python_cusum(vals)
    got = _spark_cusum(spark, rows)
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE s (key BIGINT, ts TIMESTAMP, v BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
    sql = temporal.cusum_split_sql("s", "key", "ts", "v")
    twin = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    assert twin == want

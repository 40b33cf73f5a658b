"""Kendall rank correlation on the bottom-k sample (operators/ranking.py).

Pair-order agreement between two integer metrics — monotone-invariant,
overflow-proof (comparisons only, never the Δx·Δy product), sampled to
bound the pairwise stage at k²/2 per group regardless of group size.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import ranking


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("kendall-tests", master="local[4]",
                    shuffle_partitions=8)


def _rows():
    rows = []
    for i in range(40):
        rows.append((1, i, i * 3 + 7, 1000 + i))       # perfect monotone
    for i in range(40):
        rows.append((2, i, 1000 - i, 2000 + i))        # perfect reverse
    for i in range(300):
        rows.append((3, i, (i * 37) % 100 + i // 2, 3000 + i))  # noisy
    for i in range(30):
        rows.append((4, i // 5, i % 3, 4000 + i))      # heavy ties
    rows.append((5, 9, 9, 5000))                       # singleton
    return rows


def test_planted_semantics(spark):
    df = spark.createDataFrame(_rows(), "g int, x bigint, y bigint, k bigint")
    out = {r.g: r for r in ranking.kendall_tau(
        df, "g", "x", "y", "k", k=64).collect()}
    # perfect monotone: every pair concordant, tau = gamma = +1e6
    assert out[1].tau_a_ppm == 1_000_000 and out[1].gamma_ppm == 1_000_000
    assert out[1].concordant == 40 * 39 // 2 and out[1].discordant == 0
    # perfect reverse: −1e6
    assert out[2].tau_a_ppm == -1_000_000 and out[2].gamma_ppm == -1_000_000
    # ties neither concord nor discord; gamma excludes them so |gamma| ≥ |tau_a|
    assert out[4].tie_pairs > 0
    assert abs(out[4].gamma_ppm) >= abs(out[4].tau_a_ppm)
    assert (out[4].concordant + out[4].discordant + out[4].tie_pairs
            == out[4].n_sample * (out[4].n_sample - 1) // 2)
    # singleton: no pairs → NULL correlation
    assert out[5].tau_a_ppm is None and out[5].gamma_ppm is None


def test_monotone_rescaling_invariance(spark):
    """Kendall's defining property: any strictly monotone rescaling of
    either axis leaves every pair order — hence the whole output row —
    unchanged."""
    base = [(1, i, (i * 37) % 100 + i // 2, 7000 + i) for i in range(200)]
    df1 = spark.createDataFrame(base, "g int, x bigint, y bigint, k bigint")
    warped = [(g, x * x + 5, y * 1000 - 3, k) for g, x, y, k in base]
    df2 = spark.createDataFrame(warped, "g int, x bigint, y bigint, k bigint")
    r1 = sorted(map(tuple, ranking.kendall_tau(
        df1, "g", "x", "y", "k", k=128).collect()))
    r2 = sorted(map(tuple, ranking.kendall_tau(
        df2, "g", "x", "y", "k", k=128).collect()))
    assert r1 == r2


def test_sampling_accuracy_pin(spark):
    """k=128 sample of a 5000-row group with true tau ≈ 0.66 (planted
    deterministic noise): the sampled estimate must land within 0.1 —
    a regression pin, not a statistical test (one fixed hash)."""
    rows = [(1, i, i + ((i * 2654435761) % 997) * 3, i) for i in range(5000)]
    df = spark.createDataFrame(rows, "g int, x bigint, y bigint, k bigint")
    full = ranking.kendall_tau(df, "g", "x", "y", "k", k=2048).collect()[0]
    sampled = ranking.kendall_tau(df, "g", "x", "y", "k", k=128).collect()[0]
    assert abs(full.tau_a_ppm - sampled.tau_a_ppm) < 100_000, (
        full.tau_a_ppm, sampled.tau_a_ppm)


def test_overflow_proof_wide_metrics(spark):
    """Metrics near ±int64 extremes: the (Δx·Δy) product would wrap in
    Spark and raise in DuckDB — comparisons-only concordance must not."""
    big = 2**62
    rows = [(1, -big, -big, 1), (1, big, big, 2), (1, 0, big - 7, 3)]
    df = spark.createDataFrame(rows, "g int, x bigint, y bigint, k bigint")
    out = ranking.kendall_tau(df, "g", "x", "y", "k", k=16).collect()[0]
    assert out.tau_a_ppm == 1_000_000  # all 3 pairs concordant


def test_duckdb_twin_matches(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "g int, x bigint, y bigint, k bigint")
    got = sorted(map(tuple, ranking.kendall_tau(
        df, "g", "x", "y", "k", k=64).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, x BIGINT, y BIGINT, k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    want = sorted(map(tuple, con.execute(
        ranking.kendall_tau_sql("t", "g", "x", "y", "k", k=64)).fetchall()))
    assert got == want


def test_k_validated(spark):
    df = spark.createDataFrame([(1, 1, 1, 1)], "g int, x int, y int, k int")
    with pytest.raises(ValueError):
        ranking.kendall_tau(df, "g", "x", "y", "k", k=3)
    with pytest.raises(ValueError):
        ranking.kendall_tau(df, "g", "x", "y", "k", k=5000)


def test_plan_bottom_k_before_pairs(spark):
    """The scale claim: the sample must plan as WindowGroupLimit (≤ k
    rows per group cross the shuffle BEFORE the triangular join) and
    there must be no global (unpartitioned) window anywhere."""
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 13 % 997).alias("x"),
        (F.col("id") * 7 % 991).alias("y"),
        F.col("id").alias("k"),
    )
    plan = ranking.kendall_tau(df, "g", "x", "y", "k", k=64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # every window spec is partitioned by the group column (no
    # single-partition global window sneaks in)
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "windowspecdefinition(g#" in line, line
    # the bounded pair stage broadcasts (≤ k rows/group on each side)
    assert "BroadcastHashJoin" in plan

"""Rendezvous (HRW) shard assignment (sketches.hrw_assign) — the
minimal-disruption property (adding a shard moves ≈1/(n+1) of keys,
all TO the new shard), balance sanity, a plain-Python mirror of the
chained-hash score, and DuckDB twin parity."""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import sketches


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hrw-tests", master="local[4]",
                    shuffle_partitions=8)


def _kmv_py(v):
    h = (v % 2_147_483_648) * 2654435761 % 4_294_967_296
    return (h ^ (h >> 16)) % 4_294_967_296


def _hrw_py(key, n):
    best = None
    for s in range(n):
        sc = _kmv_py(_kmv_py(key) + (s + 1) * sketches.HRW_STEP)
        if best is None or (sc, s) > best:
            best = (sc, s)
    return best[1]


def _spark_assign(spark, keys, n):
    df = spark.createDataFrame([(k,) for k in keys], "doc_id bigint")
    out = sketches.hrw_assign(df, "doc_id", n).collect()
    return {r["doc_id"]: r["shard"] for r in out}


KEYS = list(range(500))


def test_matches_python_mirror(spark):
    got = _spark_assign(spark, KEYS, 8)
    assert got == {k: _hrw_py(k, 8) for k in KEYS}


def test_balance_rough(spark):
    """8 shards over 500 sequential keys: every shard non-empty, no
    shard above 2.5× the fair share (the mix is a hash, not magic)."""
    got = _spark_assign(spark, KEYS, 8)
    sizes = [sum(1 for v in got.values() if v == s) for s in range(8)]
    assert all(sz > 0 for sz in sizes)
    assert max(sizes) < 2.5 * len(KEYS) / 8


def test_minimal_disruption_on_add(spark):
    """Adding shard 8: every moved key moves TO shard 8, and the
    moved fraction is near 1/9 (within loose hash tolerance)."""
    before = _spark_assign(spark, KEYS, 8)
    after = _spark_assign(spark, KEYS, 9)
    moved = [k for k in KEYS if before[k] != after[k]]
    assert all(after[k] == 8 for k in moved)
    assert 0.03 < len(moved) / len(KEYS) < 0.25


def test_single_shard_and_guard(spark):
    assert set(_spark_assign(spark, KEYS[:20], 1).values()) == {0}
    df = spark.createDataFrame([(1,)], "doc_id bigint")
    with pytest.raises(ValueError, match="n_shards"):
        sketches.hrw_assign(df, "doc_id", 0)


def test_vs_duckdb_twin(spark):
    got = _spark_assign(spark, KEYS, 12)
    con = duckdb.connect()
    con.execute("CREATE TABLE ks (doc_id BIGINT)")
    con.executemany("INSERT INTO ks VALUES (?)", [(k,) for k in KEYS])
    sql = sketches.hrw_assign_sql("ks", "doc_id", 12)
    twin = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert twin == got

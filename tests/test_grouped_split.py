"""Leakage-safe grouped dataset split (sampling.grouped_split) —
group-integrity and subset-stability properties, ratio validation,
a plain-Python mirror of the residue chain, and DuckDB twin parity."""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import sampling
from openstreetmap_license_change_spark.operators.dedup import token_hash
from openstreetmap_license_change_spark.operators.sketches import (
    _KMV_MULT,
    _TWO31,
    _TWO32,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("grouped-split-tests", master="local[4]",
                    shuffle_partitions=8)


SPLITS = [("train", 800_000), ("val", 100_000), ("test", 100_000)]


def _python_token_hash(s):
    h = 0
    for ch in s:  # code points, matching F.ascii per split char
        h = (h * 131 + ord(ch)) % 2_147_483_647
    return h


def _python_split(group, splits=SPLITS, scale=10**6):
    v = _python_token_hash(str(group))
    h = (v % _TWO31) * _KMV_MULT % _TWO32
    r = ((h ^ (h >> 16)) % _TWO32) % scale
    cum = 0
    for name, m in splits[:-1]:
        cum += m
        if r < cum:
            return name
    return splits[-1][0]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, grp string")


def test_group_integrity(spark):
    """Every group lands wholly in one split."""
    rows = [(i, f"dom{i % 37}") for i in range(500)]
    got = sampling.grouped_split(_mk(spark, rows), "grp", SPLITS).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_grp.values())


def test_subset_stability(spark):
    """Removing rows never changes a surviving group's split — the
    incremental-crawl invariant."""
    rows = [(i, f"dom{i % 23}") for i in range(300)]
    full = {
        r["grp"]: r["split"]
        for r in sampling.grouped_split(
            _mk(spark, rows), "grp", SPLITS
        ).collect()
    }
    sub = {
        r["grp"]: r["split"]
        for r in sampling.grouped_split(
            _mk(spark, rows[::7]), "grp", SPLITS
        ).collect()
    }
    assert all(full[g] == s for g, s in sub.items())


def test_matches_python_mirror(spark):
    rows = [(i, f"site{i}.example") for i in range(200)]
    got = sampling.grouped_split(_mk(spark, rows), "grp", SPLITS).collect()
    for r in got:
        assert r["split"] == _python_split(r["grp"]), r["grp"]
    # sanity: with 200 distinct groups all three splits are inhabited
    assert {r["split"] for r in got} == {"train", "val", "test"}


def test_zero_ratio_split_declared_empty(spark):
    rows = [(i, f"g{i}") for i in range(100)]
    got = sampling.grouped_split(
        _mk(spark, rows), "grp",
        [("train", 1_000_000), ("unused", 0)],
    ).collect()
    assert all(r["split"] == "train" for r in got)


def test_ratio_validation(spark):
    df = _mk(spark, [(1, "a")])
    with pytest.raises(ValueError, match="at least 2"):
        sampling.grouped_split(df, "grp", [("all", 10**6)])
    with pytest.raises(ValueError, match="sum"):
        sampling.grouped_split(df, "grp", [("a", 1), ("b", 2)])
    with pytest.raises(ValueError, match="negative"):
        sampling.grouped_split(
            df, "grp", [("a", -1), ("b", 1_000_001)]
        )


def test_duckdb_twin(spark):
    rows = [(i, f"dom{i % 41}") for i in range(400)]
    want = {
        (r["doc_id"], r["grp"]): r["split"]
        for r in sampling.grouped_split(
            _mk(spark, rows), "grp", SPLITS
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, grp VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            sampling.grouped_split_sql("t", "grp", SPLITS)
        ).fetchall()
    }
    assert got == want

"""Cell-cover compaction (spatial.compact_cells / uncompact_cells) —
planted promote chains, maximality, uncompact∘compact identity,
validation guards, and parity of the Spark ITERATIVE promotion vs the
Python/DuckDB CLOSED FORM (maximal complete ancestors)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial

RES_SHIFT = spatial._RES_SHIFT
MASK = spatial._BASE_MASK


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("cell-compact-tests", master="local[4]",
                    shuffle_partitions=8)


def _cid(res, base):
    return (res << RES_SHIFT) | base


def _compact_py(bases, res):
    """Closed form: complete ancestors whose parent is not complete."""
    complete = set()
    for q in range(res + 1):
        shift = 2 * (res - q)
        groups = {}
        for b in set(bases):
            groups[b >> shift] = groups.get(b >> shift, 0) + 1
        for qb, n in groups.items():
            if n == 4 ** (res - q):
                complete.add((q, qb))
    return sorted(
        (_cid(q, qb), q)
        for q, qb in complete
        if q == 0 or (q - 1, qb >> 2) not in complete
    )


def _spark_compact(spark, bases, res):
    df = spark.createDataFrame(
        [(_cid(res, b),) for b in bases], "cell bigint"
    )
    return sorted(
        (r["cell"], r["res"])
        for r in spatial.compact_cells(df, res).collect()
    )


def test_single_full_block_promotes(spark):
    # the 4 children of parent base 5 at res 3 → one res-2 cell
    bases = [5 * 4 + i for i in range(4)]
    assert _spark_compact(spark, bases, 3) == [(_cid(2, 5), 2)]


def test_nested_two_level_promotion(spark):
    # all 16 res-4 descendants of res-2 base 9 → promotes twice
    bases = [9 * 16 + i for i in range(16)]
    assert _spark_compact(spark, bases, 4) == [(_cid(2, 9), 2)]


def test_partial_group_stays(spark):
    bases = [8, 9, 10]  # 3 of 4 siblings of parent 2
    assert _spark_compact(spark, bases, 3) == [
        (_cid(3, 8), 3), (_cid(3, 9), 3), (_cid(3, 10), 3)
    ]


def test_mixed_block_and_strays(spark):
    bases = [4 * 7 + i for i in range(4)] + [3, 50]
    got = _spark_compact(spark, bases, 5)
    assert got == sorted(
        [(_cid(4, 7), 4), (_cid(5, 3), 5), (_cid(5, 50), 5)]
    )


def test_duplicates_dropped(spark):
    bases = [8, 8, 9, 9, 10, 11]
    assert _spark_compact(spark, bases, 3) == [(_cid(2, 2), 2)]


def test_validation(spark):
    df = spark.createDataFrame(
        [(_cid(3, 1),), (_cid(4, 1),)], "cell bigint"
    )
    with pytest.raises(ValueError, match="uniform"):
        spatial.compact_cells(df, 3)
    with pytest.raises(ValueError, match="res must be"):
        spatial.compact_cells(df, 17)


def test_uncompact_guards(spark):
    df = spark.createDataFrame([(_cid(6, 3),)], "cell bigint")
    with pytest.raises(ValueError, match="finer than target"):
        spatial.uncompact_cells(df, 5)
    with pytest.raises(ValueError, match="guard"):
        spatial.uncompact_cells(
            spark.createDataFrame([(_cid(0, 0),)], "cell bigint"), 12
        )


def test_uncompact_mixed_res(spark):
    df = spark.createDataFrame(
        [(_cid(2, 9),), (_cid(4, 7),)], "cell bigint"
    )
    got = sorted(
        r["cell"] for r in spatial.uncompact_cells(df, 4).collect()
    )
    want = sorted(
        [_cid(4, 9 * 16 + i) for i in range(16)] + [_cid(4, 7)]
    )
    assert got == want


def _random_bases(rng, res, n_blocks, n_strays):
    bases = set()
    for _ in range(n_blocks):
        parent = rng.randrange(0, 4 ** (res - 1))
        bases.update(parent * 4 + i for i in range(4))
    while len(bases) < n_blocks * 4 + n_strays:
        bases.add(rng.randrange(0, 4 ** res))
    return sorted(bases)


def test_random_vs_python_and_duckdb_and_roundtrip(spark):
    rng = random.Random(777)
    res = 5
    for trial in range(3):
        bases = _random_bases(rng, res, 12, 40)
        want = _compact_py(bases, res)
        got = _spark_compact(spark, bases, res)
        assert got == want

        # maximality: no output cell's parent is complete
        out_res = {q for _, q in want}
        assert all(q <= res for q in out_res)

        con = duckdb.connect()
        con.execute("CREATE TABLE cells (cell BIGINT)")
        con.executemany(
            "INSERT INTO cells VALUES (?)",
            [(_cid(res, b),) for b in bases],
        )
        oracle = sorted(
            tuple(r)
            for r in con.execute(
                spatial.compact_cells_sql("cells", res)
            ).fetchall()
        )
        assert oracle == want

        # uncompact(compact(S)) == S, Spark and DuckDB twins agree
        cdf = spark.createDataFrame(
            [(c,) for c, _ in want], "cell bigint"
        )
        back = sorted(
            r["cell"]
            for r in spatial.uncompact_cells(cdf, res).collect()
        )
        assert back == [_cid(res, b) for b in bases]
        con.execute("CREATE TABLE compacted (cell BIGINT)")
        con.executemany(
            "INSERT INTO compacted VALUES (?)", [(c,) for c, _ in want]
        )
        oback = sorted(
            r[0]
            for r in con.execute(
                spatial.uncompact_cells_sql("compacted", res)
            ).fetchall()
        )
        assert oback == back

"""Cover-membership filtering (spatial.filter_by_cover) — mixed-res
covers, semi/anti complementarity, duplicate-row preservation,
finer-than-points raise, empty cover, and DuckDB twin parity (EXISTS
prefix predicate vs the ancestor fan) on random covers."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial

RES_SHIFT = spatial._RES_SHIFT


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("cover-filter-tests", master="local[4]",
                    shuffle_partitions=8)


def _cid(res, base):
    return (res << RES_SHIFT) | base


def _py_member(pcell, cover, point_res):
    pb = pcell & spatial._BASE_MASK
    for c in cover:
        r = c >> RES_SHIFT
        if r <= point_res and (pb >> (2 * (point_res - r))) == (
            c & spatial._BASE_MASK
        ):
            return True
    return False


def _run(spark, points, cover, mode="semi", point_res=6):
    pdf = spark.createDataFrame(points, "url string, cell bigint")
    cdf = spark.createDataFrame([(c,) for c in cover], "cell bigint")
    rows = spatial.filter_by_cover(
        pdf, cdf, point_res, mode=mode
    ).collect()
    return sorted((r["url"], r["cell"]) for r in rows)


def test_mixed_res_cover(spark):
    # cover: the res-2 cell base 9 (subtree 9*…) + res-6 single 1234
    cover = [_cid(2, 9), _cid(6, 1234)]
    inside_tree = _cid(6, 9 * 256 + 17)   # descendant of (2, 9)
    exact_single = _cid(6, 1234)
    outside = _cid(6, 9999)
    pts = [("a", inside_tree), ("b", exact_single), ("c", outside)]
    assert _run(spark, pts, cover) == [
        ("a", inside_tree), ("b", exact_single)
    ]
    assert _run(spark, pts, cover, mode="anti") == [("c", outside)]


def test_duplicates_preserved(spark):
    cover = [_cid(2, 9)]
    p = _cid(6, 9 * 256)
    pts = [("a", p), ("a", p), ("b", p)]
    assert _run(spark, pts, cover) == [("a", p), ("a", p), ("b", p)]


def test_finer_cover_raises(spark):
    pdf = spark.createDataFrame([("a", _cid(4, 1))],
                                "url string, cell bigint")
    cdf = spark.createDataFrame([(_cid(6, 5),)], "cell bigint")
    with pytest.raises(ValueError, match="finer"):
        spatial.filter_by_cover(pdf, cdf, 4)
    with pytest.raises(ValueError, match="mode"):
        spatial.filter_by_cover(pdf, cdf, 4, mode="left")


def test_empty_cover(spark):
    pdf = spark.createDataFrame([("a", _cid(4, 1))],
                                "url string, cell bigint")
    cdf = spark.createDataFrame([], "cell bigint")
    assert spatial.filter_by_cover(pdf, cdf, 4).count() == 0
    assert spatial.filter_by_cover(pdf, cdf, 4, mode="anti").count() == 1


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(909)
    point_res = 6
    cover = set()
    for _ in range(8):
        r = rng.choice([2, 3, 4, 6])
        cover.add(_cid(r, rng.randrange(0, 4 ** r)))
    cover = sorted(cover)
    pts = [
        (f"p{i}", _cid(point_res, rng.randrange(0, 4 ** point_res)))
        for i in range(300)
    ]
    want = sorted(
        (u, c) for u, c in pts if _py_member(c, cover, point_res)
    )
    assert _run(spark, pts, cover, point_res=point_res) == want
    anti = sorted(
        (u, c) for u, c in pts if not _py_member(c, cover, point_res)
    )
    assert _run(spark, pts, cover, mode="anti",
                point_res=point_res) == anti

    con = duckdb.connect()
    con.execute("CREATE TABLE pts (url VARCHAR, cell BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    con.execute("CREATE TABLE cov (cell BIGINT)")
    con.executemany("INSERT INTO cov VALUES (?)", [(c,) for c in cover])
    got = sorted(
        tuple(r)
        for r in con.execute(
            spatial.cover_filter_sql("pts", "cov", point_res)
        ).fetchall()
    )
    assert got == want

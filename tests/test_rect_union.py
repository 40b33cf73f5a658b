"""Rectangle-union / dissolve area (spatial.rect_union_area): exact
slab sweep + y-interval gaps-and-islands, half-open touch semantics,
degenerate-rect behavior, loud guards, compressed-grid rasterization
mirror (a structurally different algorithm), DuckDB twin parity."""

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("rect-union-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "gid long, minx long, miny long, maxx long, maxy long"


def _run(spark, rows, **kw):
    out = spatial.rect_union_area(
        spark.createDataFrame(rows, SCHEMA), group_col="gid", **kw
    ).collect()
    return {
        r["gid"]: (r["n_rects"], r["bbox_area"], r["union_area"],
                   r["covered_ppm"])
        for r in out
    }


def _python(rows):
    """Compressed-grid rasterization: every cell of the group's own
    coordinate grid is either fully inside or fully outside each rect,
    so the union area is the sum of covered-cell areas.  Structurally
    different from the operator's sweep."""
    out = {}
    gids = sorted({r[0] for r in rows})
    for gid in gids:
        rs = [r[1:] for r in rows if r[0] == gid]
        xs = sorted({v for r in rs for v in (r[0], r[2])})
        ys = sorted({v for r in rs for v in (r[1], r[3])})
        union = 0
        for xi in range(len(xs) - 1):
            for yj in range(len(ys) - 1):
                if any(
                    x0 <= xs[xi] and xs[xi + 1] <= x1
                    and y0 <= ys[yj] and ys[yj + 1] <= y1
                    for x0, y0, x1, y1 in rs
                ):
                    union += (xs[xi + 1] - xs[xi]) * (ys[yj + 1] - ys[yj])
        bbox = (max(r[2] for r in rs) - min(r[0] for r in rs)) * (
            max(r[3] for r in rs) - min(r[1] for r in rs)
        )
        ppm = union * 10**6 // bbox if bbox > 0 else None
        out[gid] = (len(rs), bbox, union, ppm)
    return out


def test_disjoint_rects_sum(spark):
    rows = [(1, 0, 0, 10, 10), (1, 20, 20, 30, 40)]
    got = _run(spark, rows)
    assert got[1] == (2, 30 * 40, 100 + 200, (300 * 10**6) // 1200)


def test_nested_rect_is_absorbed(spark):
    rows = [(1, 0, 0, 10, 10), (1, 2, 2, 5, 5)]
    assert _run(spark, rows)[1] == (2, 100, 100, 10**6)


def test_partial_overlap_inclusion_exclusion(spark):
    # [0,10)² ∪ [5,15)² = 100 + 100 − 25 = 175.
    rows = [(1, 0, 0, 10, 10), (1, 5, 5, 15, 15)]
    assert _run(spark, rows)[1] == (2, 225, 175, 175 * 10**6 // 225)


def test_touching_edges_merge_without_double_count(spark):
    # x-touching and y-touching: seamless under half-open semantics.
    rows = [(1, 0, 0, 10, 10), (1, 10, 0, 20, 10),
            (2, 0, 0, 10, 10), (2, 0, 10, 10, 20)]
    got = _run(spark, rows)
    assert got[1] == (2, 200, 200, 10**6)
    assert got[2] == (2, 200, 200, 10**6)


def test_degenerate_rects(spark):
    # zero-width rect adds nothing; an empty y-interval must not
    # bridge the gap between two real islands.
    rows = [(1, 0, 0, 10, 10), (1, 3, 50, 3, 60),
            (2, 0, 0, 10, 10), (2, 0, 20, 10, 20), (2, 0, 30, 10, 40)]
    got = _run(spark, rows)
    assert got[1][2] == 100
    assert got[2][2] == 200  # the [20,20) line bridges nothing
    # all-degenerate group: zero bbox -> covered_ppm NULL, union 0.
    one = _run(spark, [(3, 5, 5, 5, 5)])
    assert one[3] == (1, 0, 0, None)


def test_inverted_rect_fails_loud(spark):
    with pytest.raises(Exception, match="inverted rect"):
        _run(spark, [(1, 10, 0, 0, 10)])


def test_group_size_guard_fires(spark):
    rows = [(1, i, 0, i + 2, 5) for i in range(5)]
    with pytest.raises(Exception, match="max_rects_per_group"):
        _run(spark, rows, max_rects_per_group=3)


def _random_rows():
    rows = []
    for i in range(160):
        gid = (i * 7) % 4
        x0 = (i * i * 13 + i) % 41
        y0 = (i * 17 + 5) % 37
        w = (i * 3) % 14
        h = (i * 11) % 9
        rows.append((gid, x0, y0, x0 + w, y0 + h))
    return rows


def test_random_matches_rasterization_mirror(spark):
    rows = _random_rows()
    assert _run(spark, rows) == _python(rows)


def test_duckdb_twin_parity(spark):
    rows = _random_rows()
    con = duckdb.connect()
    con.register(
        "ru_src",
        pd.DataFrame(rows,
                     columns=["gid", "minx", "miny", "maxx", "maxy"]),
    )
    oracle = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]),
                    None if r[4] is None else int(r[4]))
        for r in con.execute(
            spatial.rect_union_area_sql("ru_src", "gid")
        ).fetchall()
    }
    assert _run(spark, rows) == oracle

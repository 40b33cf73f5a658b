"""Simple-polygon validity (spatial.polygon_validity) — planted
valid/bowtie/spike/degenerate rings, closing-vertex normalization,
zero-length edges, exact predicate twin parity."""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("polyvalid-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rings, **kw):
    rows = [
        (pid, i, float(x), float(y))
        for pid, pts in rings.items()
        for i, (x, y) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "polygon_id bigint, seq bigint, lon double, lat double"
    )
    out = spatial.polygon_validity(df, **kw).collect()
    return {
        r.polygon_id: (
            r.n_vertices, r.area2_q, r.orientation, r.n_zero_edges,
            r.n_cross_pairs, r.is_valid,
        )
        for r in out
    }


S = 1_000_000  # default scale: 1 unit -> 1e6 quantized


def test_valid_square_ccw(spark):
    got = _run(spark, {1: [(0, 0), (2, 0), (2, 2), (0, 2)]})
    n, a2, orient, zero, cross, ok = got[1]
    assert (n, orient, zero, cross, ok) == (4, "ccw", 0, 0, True)
    assert a2 == 2 * (2 * S) ** 2 // (2 * S) * (2 * S)  # 8e12


def test_cw_triangle_valid(spark):
    got = _run(spark, {1: [(0, 0), (0, 3), (3, 0)]})
    n, a2, orient, zero, cross, ok = got[1]
    assert (n, orient, ok) == (3, "cw", True)
    assert a2 == -9 * S * S


def test_closing_duplicate_normalized(spark):
    got = _run(
        spark, {1: [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]}
    )
    assert got[1][0] == 4 and got[1][5] is True


def test_bowtie_crosses(spark):
    """(0,0)→(2,2)→(2,0)→(0,2): edges 0 and 2 properly cross."""
    got = _run(spark, {1: [(0, 0), (2, 2), (2, 0), (0, 2)]})
    n, a2, orient, zero, cross, ok = got[1]
    assert cross >= 1 and ok is False


def test_spike_detected(spark):
    """Vertex path doubles back along its own edge: collinear
    adjacent fold + the non-adjacent overlap both flag."""
    got = _run(
        spark,
        {1: [(0, 0), (4, 0), (4, 4), (2, 4), (3, 4), (0, 4)]},
    )
    assert got[1][4] >= 2 and got[1][5] is False


def test_collinear_midpoint_is_fine(spark):
    """A redundant collinear vertex mid-edge is NOT a spike."""
    got = _run(
        spark, {1: [(0, 0), (2, 0), (4, 0), (4, 4), (0, 4)]}
    )
    assert got[1][4] == 0 and got[1][5] is True


def test_zero_edge_and_degenerate(spark):
    got = _run(
        spark,
        {
            1: [(0, 0), (2, 0), (2, 0), (2, 2)],   # duplicate vertex
            2: [(0, 0), (1, 0), (2, 0)],            # area-0 line
            3: [(5, 5)],                             # lone point
        },
    )
    assert got[1][3] == 1 and got[1][5] is False
    assert got[2][2] == "degenerate" and got[2][5] is False
    assert got[3][0] == 1 and got[3][5] is False


def test_vertex_touch_nonadjacent(spark):
    """Figure-eight touching at a repeated vertex (non-consecutive):
    non-adjacent edges share a point → non-simple."""
    got = _run(
        spark,
        {1: [(0, 0), (2, 0), (1, 1), (2, 2), (0, 2), (1, 1)]},
    )
    assert got[1][4] >= 1 and got[1][5] is False


def test_guards(spark):
    rings = {1: [(0, 0), (1, 0), (1, 1), (0, 1)]}
    with pytest.raises(Exception, match="max_vertices"):
        _run(spark, rings, max_vertices=3)
    with pytest.raises(ValueError, match="scale"):
        spatial.polygon_validity_sql("t", scale=10_000_000)


def test_duckdb_twin_parity(spark):
    rings = {
        1: [(0, 0), (2, 0), (2, 2), (0, 2)],
        2: [(0, 0), (2, 2), (2, 0), (0, 2)],
        3: [(0, 0), (4, 0), (4, 4), (2, 4), (3, 4), (0, 4)],
        4: [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)],
        5: [(0, 0), (1, 0), (2, 0)],
        6: [(0.25, 0.125), (1.75, 0.375), (1.5, 1.625),
            (0.125, 1.875)],
    }
    got = _run(spark, rings)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(polygon_id BIGINT, seq BIGINT, "
        "lon DOUBLE, lat DOUBLE)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?)",
        [
            (pid, i, float(x), float(y))
            for pid, pts in rings.items()
            for i, (x, y) in enumerate(pts)
        ],
    )
    sql_rows = con.execute(
        spatial.polygon_validity_sql("t")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in sql_rows} == got

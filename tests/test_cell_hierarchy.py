"""Hierarchical Morton cell ids (H3-res / S2-level analogue): the
parent/child/containment algebra and the multi-resolution rollup.

Ground truths are pure-Python re-derivations (independent bit code),
plus the algebraic laws the hierarchy must satisfy exactly:
  * assignment commutes with truncation:
      hier_cell(p, r) == parent(hier_cell(p, f), r)   for r <= f
  * parent(child) == cell, cell ∈ children(parent)
  * containment is the Morton-prefix relation
  * center roundtrip: hier_cell(center(c), res(c)) == c
"""

import random

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("cell-hier-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _py_morton16(lon, lat):
    x = min(max(int((lon + 180.0) * 65536.0 / 360.0), 0), 65535)
    y = min(max(int((lat + 90.0) * 65536.0 / 180.0), 0), 65535)
    out = 0
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def _py_hier(lon, lat, res):
    return (res << 36) | (_py_morton16(lon, lat) >> (2 * (16 - res)))


RNG = random.Random(42)
POINTS = [
    (RNG.uniform(-180.0, 180.0), RNG.uniform(-90.0, 90.0)) for _ in range(300)
] + [(-180.0, -90.0), (179.999, 89.999), (0.0, 0.0), (180.0, 90.0)]


def test_hier_cell_matches_python_reference(spark):
    df = spark.createDataFrame(POINTS, "lon double, lat double")
    for res in (0, 1, 5, 7, 9, 12, 16):
        got = df.select(
            "lon", "lat", spatial.hier_cell(F.col("lon"), F.col("lat"), res).alias("c")
        ).collect()
        for r in got:
            assert r.c == _py_hier(r.lon, r.lat, res), (r.lon, r.lat, res)


def test_assignment_commutes_with_truncation(spark):
    """hier_cell(p, r) == cell_parent(hier_cell(p, 16), r) — the law
    that makes the multires rollup's hierarchical re-aggregation exact."""
    df = spark.createDataFrame(POINTS, "lon double, lat double")
    for r in (0, 3, 7, 12):
        out = df.select(
            spatial.hier_cell(F.col("lon"), F.col("lat"), r).alias("direct"),
            spatial.cell_parent(
                spatial.hier_cell(F.col("lon"), F.col("lat"), 16), r, res=16
            ).alias("trunc"),
        ).collect()
        assert all(o.direct == o.trunc for o in out), r


def test_parent_child_roundtrip(spark):
    cells = [(_py_hier(lon, lat, 9),) for lon, lat in POINTS[:100]]
    df = spark.createDataFrame(cells, "cell bigint")
    kids = df.select(
        "cell", F.explode(spatial.cell_children(F.col("cell"), res=9)).alias("k")
    )
    back = kids.select(
        "cell",
        "k",
        spatial.cell_parent(F.col("k"), 9, res=10).alias("p"),
        spatial.cell_res(F.col("k")).alias("kr"),
    ).collect()
    assert len(back) == 4 * len(cells)
    for r in back:
        assert r.p == r.cell
        assert r.kr == 10


def test_parent_child_dynamic_res_matches_literal(spark):
    """The res=None paths (shift amount read from the id) agree with
    the literal-shift fast paths."""
    cells = [(_py_hier(lon, lat, 12),) for lon, lat in POINTS[:100]]
    df = spark.createDataFrame(cells, "cell bigint")
    out = df.select(
        spatial.cell_parent(F.col("cell"), 7, res=12).alias("lit"),
        spatial.cell_parent(F.col("cell"), 7).alias("dyn"),
        spatial.cell_children(F.col("cell"), res=12).alias("klit"),
        spatial.cell_children(F.col("cell")).alias("kdyn"),
    ).collect()
    for r in out:
        assert r.lit == r.dyn
        assert r.klit == r.kdyn


def test_dynamic_res_bounds_are_guarded(spark):
    """ADVICE r3: the dynamic-res paths must not fabricate ids.
    cell_parent with a row COARSER than parent_res → NULL (a negative
    shift would otherwise yield garbage); cell_children at res 16 →
    NULL (res-17 ids don't exist); static out-of-range args raise."""
    c5 = _py_hier(10.0, 20.0, 5)
    c16 = _py_hier(10.0, 20.0, 16)
    df = spark.createDataFrame([(c5,), (c16,)], "cell bigint")

    out = df.select(
        "cell",
        spatial.cell_parent(F.col("cell"), 10).alias("p10"),
        spatial.cell_children(F.col("cell")).alias("kids"),
    ).collect()
    by_cell = {r.cell: r for r in out}
    # res-5 row: no ancestor at res 10 → NULL, children exist (res 6)
    assert by_cell[c5].p10 is None
    assert by_cell[c5].kids is not None and len(by_cell[c5].kids) == 4
    assert all((k >> 36) == 6 for k in by_cell[c5].kids)
    # res-16 row: parent at 10 exists, children do NOT (leaf level)
    assert by_cell[c16].p10 == _py_hier(10.0, 20.0, 10)
    assert by_cell[c16].kids is None

    with pytest.raises(ValueError):
        spatial.cell_parent(F.col("cell"), 17)
    with pytest.raises(ValueError):
        spatial.cell_parent(F.col("cell"), -1)
    with pytest.raises(ValueError):
        spatial.cell_children(F.col("cell"), res=16)


def test_cell_contains_is_prefix_relation(spark):
    rows = []
    for lon, lat in POINTS[:80]:
        anc = _py_hier(lon, lat, 5)
        desc_same_subtree = _py_hier(lon, lat, 11)
        rows.append((anc, desc_same_subtree, True))
        rows.append((anc, anc, True))              # self-containment
        rows.append((desc_same_subtree, anc, False))  # wrong direction
    # cross pair: ancestor of point A vs descendant of point B
    for (lon_a, lat_a), (lon_b, lat_b) in zip(POINTS[:40], POINTS[40:80]):
        anc = _py_hier(lon_a, lat_a, 5)
        desc = _py_hier(lon_b, lat_b, 11)
        expect = (desc & ((1 << 36) - 1)) >> (2 * (11 - 5)) == (
            anc & ((1 << 36) - 1)
        )
        rows.append((anc, desc, expect))
    df = spark.createDataFrame(rows, "a bigint, d bigint, want boolean")
    got = df.select(
        spatial.cell_contains(F.col("a"), F.col("d")).alias("got"), "want"
    ).collect()
    assert all(r.got == r.want for r in got)


def test_cell_center_roundtrip(spark):
    """The center of a cell re-assigns to the same cell at the same
    resolution (raster→vector→raster closure)."""
    for res in (1, 5, 9, 14):
        cells = list({(_py_hier(lon, lat, res),) for lon, lat in POINTS})
        df = spark.createDataFrame(cells, "cell bigint")
        lon, lat = spatial.cell_center(F.col("cell"), res)
        out = df.select(
            "cell", spatial.hier_cell(lon, lat, res).alias("back")
        ).collect()
        assert all(r.back == r.cell for r in out), res


def test_multires_rollup_matches_direct_per_level(spark):
    """Hierarchical re-aggregation == direct aggregation at every
    level (counts AND taint sums), long-form output."""
    rows = [
        (lon, lat, RNG.random() < 0.3) for lon, lat in POINTS
    ]
    df = spark.createDataFrame(rows, "lon double, lat double, tainted boolean")
    got = {
        (r.res, r.cell): (r.n_pages, r.n_tainted, r.taint_density)
        for r in spatial.tile_rollup_multires(df, resolutions=[3, 7, 10]).collect()
    }
    from collections import defaultdict

    want = defaultdict(lambda: [0, 0])
    for lon, lat, t in rows:
        for res in (3, 7, 10):
            k = (res, _py_hier(lon, lat, res))
            want[k][0] += 1
            want[k][1] += int(t)
    assert set(got) == set(want)
    for k, (np_, nt, dens) in got.items():
        assert (np_, nt) == tuple(want[k]), k
        assert dens == round(nt / np_, 6), k

"""Even-odd multipolygon PIP with holes and islands
(spatial.pip_join_multipolygons)."""

import pytest

from openstreetmap_license_change_spark.operators import spatial

DONUT_ISLAND = [
    (1, [
        [(-10.0, 0.0), (20.0, 30.0), (50.0, 0.0), (20.0, -30.0)],
        [(5.0, 0.0), (20.0, 15.0), (35.0, 0.0), (20.0, -15.0)],
        [(14.0, 0.0), (20.0, 6.0), (26.0, 0.0), (20.0, -6.0)],
    ]),
    (2, [[(100.0, -40.0), (140.0, -39.0), (145.0, 0.0), (105.0, 5.0)]]),
]


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("pipmulti-tests", master="local[4]",
                    shuffle_partitions=8)


def test_donut_hole_island_parity(spark):
    pts = spark.createDataFrame(
        [
            ("ring_zone", 20.0, 20.0),    # between outer and hole → IN
            ("hole_zone", 20.0, 10.0),    # inside hole, off island → OUT
            ("island", 20.0, 1.0),        # on the island → IN again
            ("outside", 90.0, 0.0),       # nowhere
            ("poly2", 120.0, -20.0),      # plain ring
        ],
        "tag string, lon double, lat double",
    )
    out = {r.tag: r.polygon_id
           for r in spatial.pip_join_multipolygons(
               pts, DONUT_ISLAND).collect()}
    assert out == {
        "ring_zone": 1, "hole_zone": None, "island": 1,
        "outside": None, "poly2": 2,
    }


def test_single_ring_agrees_with_simple_pip(spark):
    """With every polygon a single ring, the multipolygon variant must
    reproduce pip_join_polygons exactly."""
    import random
    rng = random.Random(3)
    pts = spark.createDataFrame(
        [(i, rng.uniform(-180, 180), rng.uniform(-90, 90))
         for i in range(800)],
        "pid int, lon double, lat double",
    )
    import __spark_entry__ as entry
    simple = {r.pid: r.polygon_id for r in spatial.pip_join_polygons(
        pts, entry.PIP_POLYGONS).collect()}
    multi = {r.pid: r.polygon_id for r in spatial.pip_join_multipolygons(
        pts, [(pid, [ring]) for pid, ring in entry.PIP_POLYGONS]
    ).collect()}
    assert simple == multi


def test_bbox_prefilter_keeps_python_off_far_points(spark):
    """Points outside the union outer bbox short-circuit natively (the
    when(in_bbox, ...) guard) — spot-check the column stays null there
    and the plan contains the native conjunction."""
    pts = spark.createDataFrame(
        [(1, -179.0, -89.0)], "pid int, lon double, lat double")
    df = spatial.pip_join_multipolygons(pts, DONUT_ISLAND)
    assert df.collect()[0].polygon_id is None
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan


def test_prefiltered_equals_sequential(spark):
    """The cell-prefiltered multipolygon join must reproduce the
    sequential broadcast scan exactly (A/B), including first-match
    precedence and the hole/island parity."""
    import random
    rng = random.Random(8)
    pts = spark.createDataFrame(
        [(f"p{i}", rng.uniform(-180, 180), rng.uniform(-90, 90))
         for i in range(1200)]
        + [("in_hole", 20.0, 10.0), ("on_island", 20.0, 1.0),
           ("ring_zone", 20.0, 20.0)],
        "url string, lon double, lat double",
    )
    seq = {r.url: r.polygon_id for r in spatial.pip_join_multipolygons(
        pts, DONUT_ISLAND).collect()}
    pre = {r.url: r.polygon_id
           for r in spatial.pip_join_multipolygons_prefiltered(
               pts, DONUT_ISLAND, res_deg=15.0).collect()}
    assert seq == pre
    assert pre["in_hole"] is None and pre["on_island"] == 1


def test_prefiltered_plan_is_broadcast_hash(spark):
    pts = spark.createDataFrame(
        [("a", 1.0, 1.0)], "url string, lon double, lat double")
    plan = (
        spatial.pip_join_multipolygons_prefiltered(pts, DONUT_ISLAND)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

"""Spatial anti-join (operators/spatial.py pip_anti_join): exact
complement of the prefiltered PIP join, shuffle-free plan."""

import random

import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pip-anti-tests", master="local[4]", shuffle_partitions=4)
    yield s


POLYS = [
    (1, [(-10.0, -10.0), (10.0, -9.0), (0.0, 15.0)]),
    (2, [(30.0, 30.0), (60.0, 31.0), (60.0, 60.0), (30.0, 59.0)]),
    # overlapping with 2 — a point inside both must still anti out once
    (3, [(50.0, 50.0), (80.0, 51.0), (65.0, 70.0)]),
]


def _pts(rng, n):
    return [
        (f"p{i}", rng.uniform(-90, 90), rng.uniform(-80, 80))
        for i in range(n)
    ]


def test_exact_complement_of_pip_join(spark):
    rng = random.Random(17)
    pts = spark.createDataFrame(
        _pts(rng, 400), "url string, lon double, lat double"
    )
    matched = {
        r.url
        for r in spatial.pip_join_polygons_prefiltered(
            pts, POLYS, res_deg=10.0
        ).collect()
        if r.polygon_id is not None
    }
    anti = [r.url for r in spatial.pip_anti_join(pts, POLYS, res_deg=10.0)
            .collect()]
    assert len(anti) == len(set(anti)), "anti emitted a point twice"
    assert set(anti) == {r[0] for r in pts.collect()} - matched


def test_known_points(spark):
    pts = spark.createDataFrame(
        [
            ("inside1", 0.0, 0.0),
            ("inside2", 45.0, 45.0),
            ("inside_overlap", 55.0, 52.0),
            ("outside", 120.0, -50.0),
            ("outside_in_cover_cell", 9.9, 14.9),  # in bbox cell, not in ring
        ],
        "url string, lon double, lat double",
    )
    anti = {r.url for r in spatial.pip_anti_join(pts, POLYS, res_deg=10.0)
            .collect()}
    assert anti == {"outside", "outside_in_cover_cell"}


def test_plan_is_shuffle_free(spark):
    pts = spark.createDataFrame(
        [("a", 0.0, 0.0)], "url string, lon double, lat double"
    )
    df = spatial.pip_anti_join(pts, POLYS, res_deg=10.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only Exchange is the dim broadcast — no shuffle of the points
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan

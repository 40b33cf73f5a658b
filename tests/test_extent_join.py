"""PBSM extent-overlap join (operators/spatial.py extent_overlap_join):
reference-point dedup, closed-interval semantics, fan-out guard."""

import random

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("extent-join-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


DDL = ("rid string, lon_min double, lon_max double, "
       "lat_min double, lat_max double")


def _rects(rng, prefix, n, span):
    out = []
    for i in range(n):
        lon = rng.uniform(-175, 170)
        lat = rng.uniform(-85, 80)
        out.append((f"{prefix}{i}", lon, lon + rng.uniform(0.1, span),
                    lat, lat + rng.uniform(0.1, span)))
    return out


def test_matches_bruteforce_and_dedups(spark):
    rng = random.Random(5)
    ra = _rects(rng, "a", 120, 4.0)
    rb = _rects(rng, "b", 120, 4.0)
    for res in (2.0, 5.0):
        rows = spatial.extent_overlap_join(
            spark.createDataFrame(ra, DDL).withColumnRenamed("rid", "id_a"),
            spark.createDataFrame(rb, DDL).withColumnRenamed("rid", "id_b"),
            res_deg=res,
        ).collect()
        got = [(r.id_a, r.id_b) for r in rows]
        # reference-point rule => exactly-once, no distinct() anywhere
        assert len(got) == len(set(got)), "duplicate pair emitted"
        want = set()
        for ia, alo, ahi, bla, bha in ra:
            for ib, blo, bhi, blb, bhb in rb:
                if alo <= bhi and blo <= ahi and bla <= bhb and blb <= bha:
                    want.add((ia, ib))
        assert set(got) == want, res
        for r in rows:
            assert r.inter_lon_min <= r.inter_lon_max
            assert r.inter_lat_min <= r.inter_lat_max


def test_touching_edges_count_as_overlap(spark):
    a = spark.createDataFrame([("a", 0.0, 1.0, 0.0, 1.0)], DDL) \
        .withColumnRenamed("rid", "id_a")
    b = spark.createDataFrame([("b", 1.0, 2.0, 1.0, 2.0)], DDL) \
        .withColumnRenamed("rid", "id_b")
    rows = spatial.extent_overlap_join(a, b, res_deg=5.0).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [("a", "b")]
    assert rows[0].inter_lon_min == rows[0].inter_lon_max == 1.0


def test_cross_cell_pair_found_once(spark):
    """A pair overlapping across a cell boundary joins in 2+ cells but
    must be emitted exactly once (the SW-corner cell)."""
    a = spark.createDataFrame([("a", -0.5, 1.5, 0.2, 0.4)], DDL) \
        .withColumnRenamed("rid", "id_a")
    b = spark.createDataFrame([("b", -0.4, 1.4, 0.1, 0.3)], DDL) \
        .withColumnRenamed("rid", "id_b")
    rows = spatial.extent_overlap_join(a, b, res_deg=1.0).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [("a", "b")]


def test_max_cells_guard_fails_loud(spark):
    wide = spark.createDataFrame([("a", -170.0, 170.0, -80.0, 80.0)], DDL) \
        .withColumnRenamed("rid", "id_a")
    other = spark.createDataFrame([("b", 0.0, 1.0, 0.0, 1.0)], DDL) \
        .withColumnRenamed("rid", "id_b")
    with pytest.raises(SparkRuntimeException, match="max_cells"):
        spatial.extent_overlap_join(wide, other, res_deg=1.0,
                                    max_cells=64).collect()
    # disabling the guard makes the same join run
    n = spatial.extent_overlap_join(wide, other, res_deg=1.0,
                                    max_cells=None).count()
    assert n == 1


def test_plan_has_no_distinct_aggregate(spark):
    a = spark.createDataFrame([("a", 0.0, 1.0, 0.0, 1.0)], DDL) \
        .withColumnRenamed("rid", "id_a")
    b = spark.createDataFrame([("b", 0.5, 1.5, 0.5, 1.5)], DDL) \
        .withColumnRenamed("rid", "id_b")
    plan = spatial.extent_overlap_join(a, b, res_deg=1.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan, plan
    assert "Window" not in plan, plan

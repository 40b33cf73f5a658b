"""PBSM segment-crossing join (operators/spatial.py
segment_crossing_join): exact int predicate vs brute force,
proper-crossing-only semantics, reference-point dedup across cells,
fan-out guard, no-dedup plan."""

import random

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("segment-join-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


DDL = "sid string, lon1 double, lat1 double, lon2 double, lat2 double"
SCALE = 10_000


def _segs(rng, prefix, n, span):
    out = []
    for i in range(n):
        lon = rng.uniform(-170, 150)
        lat = rng.uniform(-80, 70)
        out.append((
            f"{prefix}{i}", lon, lat,
            lon + rng.uniform(-span, span), lat + rng.uniform(-span, span),
        ))
    return out


def _cross(px, py, qx, qy, rx, ry):
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _sgn(v):
    return (v > 0) - (v < 0)


def _brute_pairs(sa, sb):
    """Reference predicate on the SAME ×SCALE ints as the operator."""
    want = set()
    for ia, *ca in sa:
        ax1, ay1, ax2, ay2 = (round(v * SCALE) for v in ca)
        for ib, *cb in sb:
            bx1, by1, bx2, by2 = (round(v * SCALE) for v in cb)
            o1 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
            o2 = _cross(ax1, ay1, ax2, ay2, bx2, by2)
            o3 = _cross(bx1, by1, bx2, by2, ax1, ay1)
            o4 = _cross(bx1, by1, bx2, by2, ax2, ay2)
            if _sgn(o1) * _sgn(o2) < 0 and _sgn(o3) * _sgn(o4) < 0:
                want.add((ia, ib))
    return want


def _run(spark, sa, sb, res, **kw):
    return spatial.segment_crossing_join(
        spark.createDataFrame(sa, DDL).withColumnRenamed("sid", "id_a"),
        spark.createDataFrame(sb, DDL).withColumnRenamed("sid", "id_b"),
        res_deg=res, **kw,
    )


def test_matches_bruteforce_and_dedups(spark):
    rng = random.Random(11)
    sa = _segs(rng, "a", 100, 8.0)
    sb = _segs(rng, "b", 100, 8.0)
    for res in (5.0, 12.5):
        rows = _run(spark, sa, sb, res, max_cells=64).collect()
        got = [(r.id_a, r.id_b) for r in rows]
        assert len(got) == len(set(got)), "duplicate pair emitted"
        assert set(got) == _brute_pairs(sa, sb), res


def test_crossing_point_on_both_segments(spark):
    # X-shape: diagonals of the unit square cross at the center
    rows = _run(
        spark,
        [("a", 0.0, 0.0, 1.0, 1.0)],
        [("b", 0.0, 1.0, 1.0, 0.0)],
        res=1.0,
    ).collect()
    assert len(rows) == 1
    assert rows[0].ix == pytest.approx(0.5, abs=1e-9)
    assert rows[0].iy == pytest.approx(0.5, abs=1e-9)


def test_touch_and_collinear_do_not_match(spark):
    a = [("a", 0.0, 0.0, 2.0, 0.0)]
    cases = [
        ("endpoint-touch", [("b", 2.0, 0.0, 3.0, 1.0)]),
        ("T-touch", [("b", 1.0, 0.0, 1.0, 2.0)]),
        ("collinear-overlap", [("b", 1.0, 0.0, 3.0, 0.0)]),
        ("parallel", [("b", 0.0, 1.0, 2.0, 1.0)]),
        ("disjoint", [("b", 5.0, 5.0, 6.0, 6.0)]),
    ]
    for name, b in cases:
        assert _run(spark, a, b, res=1.0).count() == 0, name


def test_exactly_once_across_many_cells(spark):
    # long segments spanning many 1° cells; crossing near a cell corner
    a = [("a", -10.0, -0.3, 10.0, 0.3)]
    b = [("b", -0.3, -10.0, 0.3, 10.0)]
    rows = _run(spark, a, b, res=1.0, max_cells=128).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [("a", "b")]
    assert rows[0].ix == pytest.approx(0.0, abs=1e-6)


def test_fanout_guard_fails_loud(spark):
    a = [("a", -170.0, -80.0, 150.0, 70.0)]  # near-antipodal sweep
    with pytest.raises(SparkRuntimeException, match="max_cells"):
        _run(spark, a, a, res=1.0, max_cells=16).count()


def test_plan_has_no_dedup_aggregate(spark):
    rng = random.Random(3)
    df = _run(spark, _segs(rng, "a", 10, 5.0), _segs(rng, "b", 10, 5.0),
              res=5.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # reference-point rule: no distinct/aggregate stage after the join
    assert "HashAggregate" not in plan and "Deduplicate" not in plan

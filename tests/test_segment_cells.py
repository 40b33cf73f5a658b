"""Supercover segment rasterization (spatial.segment_cells).

Brute-force mirror: the same exact-integer column sweep evaluated in
Python, plus a sampling property (every cell containing a point of the
segment must be emitted) and the loud fan-out guard.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401  (parity with suite style)

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("segcell-tests", master="local[4]", shuffle_partitions=8)
    yield s


SCALE = 10_000


def _brute_supercover(lon1, lat1, lon2, lat2, res_deg, scale=SCALE):
    """Reference supercover in plain Python ints — same math, no Spark."""
    g = int(res_deg * scale)
    offx, offy = 180 * scale, 90 * scale
    x1 = round(lon1 * scale) + offx
    y1 = round(lat1 * scale) + offy
    x2 = round(lon2 * scale) + offx
    y2 = round(lat2 * scale) + offy
    if x2 < x1:
        x1, y1, x2, y2 = x2, y2, x1, y1
    dx, dy = x2 - x1, y2 - y1
    out = set()
    for ix in range(x1 // g, x2 // g + 1):
        if dx == 0:
            lo, hi = min(y1, y2) // g, max(y1, y2) // g
        else:
            xa, xb = max(x1, ix * g), min(x2, (ix + 1) * g)
            na = y1 * dx + dy * (xa - x1)
            nb = y1 * dx + dy * (xb - x1)
            den = dx * g
            lo, hi = min(na, nb) // den, max(na, nb) // den
        for iy in range(lo, hi + 1):
            out.add((ix, iy))
    return out


SEGMENTS = [
    # horizontal, vertical, steep, shallow, negative slope,
    # single point, endpoint exactly on a grid line, crossing 0,0
    (0.3, 0.3, 7.7, 0.3),
    (2.5, -3.0, 2.5, 6.2),
    (0.1, 0.1, 0.9, 8.9),
    (-4.0, 0.2, 11.0, 1.9),
    (5.0, 7.0, -6.0, -8.0),
    (3.3, 3.3, 3.3, 3.3),
    (2.0, 2.0, 6.0, 4.0),
    (-1.5, -2.5, 1.5, 2.5),
    # antipodal-ish long segment at coarse grid
    (-170.0, -80.0, 170.0, 80.0),
]


def _run(spark, rows, res_deg, **kw):
    df = spark.createDataFrame(
        [Row(seg_id=i, lon1=a, lat1=b, lon2=c, lat2=d)
         for i, (a, b, c, d) in enumerate(rows)]
    )
    got = spatial.segment_cells(df, res_deg=res_deg, **kw).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.seg_id, set()).add((r.cell_x, r.cell_y))
    return by_id


def test_matches_bruteforce(spark):
    res = 2.0
    by_id = _run(spark, SEGMENTS, res, max_span_cells=400)
    for i, (a, b, c, d) in enumerate(SEGMENTS):
        expect = _brute_supercover(a, b, c, d, res)
        assert by_id[i] == expect, f"segment {i}: {by_id[i] ^ expect}"


def test_no_duplicate_cells(spark):
    df = spark.createDataFrame(
        [Row(seg_id=0, lon1=-4.0, lat1=0.2, lon2=11.0, lat2=1.9)]
    )
    out = spatial.segment_cells(df, res_deg=1.0)
    assert out.count() == out.distinct().count()


def test_sampled_points_covered(spark):
    """Every cell containing a sampled interior point is emitted."""
    res = 0.5
    g = int(res * SCALE)
    by_id = _run(spark, SEGMENTS[:-1], res, max_span_cells=400)
    for i, (lon1, lat1, lon2, lat2) in enumerate(SEGMENTS[:-1]):
        x1 = round(lon1 * SCALE) + 180 * SCALE
        y1 = round(lat1 * SCALE) + 90 * SCALE
        x2 = round(lon2 * SCALE) + 180 * SCALE
        y2 = round(lat2 * SCALE) + 90 * SCALE
        n = 997
        for k in range(n + 1):
            # exact rational sample point scaled by n
            px = x1 * (n - k) + x2 * k   # = n * x(t)
            py = y1 * (n - k) + y2 * k
            cell = (px // (g * n), py // (g * n))
            assert cell in by_id[i], (i, k, cell)


def test_fanout_guard_raises(spark):
    df = spark.createDataFrame(
        [Row(seg_id=0, lon1=-170.0, lat1=-80.0, lon2=170.0, lat2=80.0)]
    )
    with pytest.raises(Exception, match="max_span_cells"):
        spatial.segment_cells(df, res_deg=0.25, max_span_cells=64).collect()


def test_res_must_be_integral():
    with pytest.raises(ValueError, match="integral"):
        spatial.segment_cells(None, res_deg=1e-9)

"""Squared Clark–Evans index (spatial.clark_evans2) — lattice reads
regular, tight cluster reads clustered, out-of-radius points are
reported not swallowed, cross-cell nearest neighbours found via the
3×3 probe, random ≡ brute mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial
from openstreetmap_license_change_spark.operators.spatial import (
    CE_PI_PPM,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ce-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "doc_id long, lon double, lat double"
BBOX = (0.0, 0.0, 10.0, 10.0)


def _run(spark, rows, delta=1.0, bbox=BBOX):
    df = spark.createDataFrame(rows, SCHEMA)
    out = spatial.clark_evans2(df, delta, bbox).collect()
    r = out[0]
    return (r.n, r.n_matched, r.n_far, r.sum_d2, r.ce2_ppm)


def _mirror(rows, delta=1.0, bbox=BBOX, scale=10_000):
    def q(v, off):
        s = v * scale
        return (int(s + 0.5) if s >= 0 else -int(-s + 0.5)) + off

    pts = [(i, q(lo, 180 * scale), q(la, 90 * scale))
           for i, lo, la in rows]
    d2max = int(round(delta * scale)) ** 2
    area = int(round((bbox[2] - bbox[0]) * scale)) * int(
        round((bbox[3] - bbox[1]) * scale)
    )
    n = len(pts)
    sd2, m = 0, 0
    for i, xa, ya in pts:
        best = None
        for j, xb, yb in pts:
            if i == j:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= d2max and (best is None or d2 < best):
                best = d2
        if best is not None:
            m += 1
            sd2 += best
    ce = (None if n < 2 or m == 0
          else (sd2 * CE_PI_PPM * n) // (m * area))
    return (n, m, n - m, sd2, ce)


def test_lattice_reads_regular(spark):
    # 100 points on a unit lattice in a 10×10 box: λ = 1/deg²,
    # every NN² = 1 deg² ⇒ ce2 = π·10⁶ — maximally regular
    rows = [(10 * i + j, i + 0.5, j + 0.5)
            for i in range(10) for j in range(10)]
    got = _run(spark, rows, delta=1.0)
    n, m, far, sd2, ce = got
    assert (n, m, far) == (100, 100, 0)
    assert sd2 == 100 * 10_000**2
    assert ce == CE_PI_PPM  # exactly π in ppm
    assert got == _mirror(rows)


def test_tight_cluster_reads_clustered(spark):
    rows = [(i, 5.0 + i * 0.001, 5.0) for i in range(20)]
    got = _run(spark, rows, delta=1.0)
    assert got[4] < 100_000   # far below CSR's 10⁶
    assert got == _mirror(rows)


def test_out_of_radius_reported(spark):
    rows = [(1, 0.5, 0.5), (2, 0.52, 0.5), (3, 9.5, 9.5)]
    got = _run(spark, rows, delta=0.25)
    assert (got[1], got[2]) == (2, 1)   # the isolate is visible
    assert got == _mirror(rows, delta=0.25)


def test_cross_cell_neighbor_found(spark):
    # neighbours straddle a cell edge: the 3×3 probe must see them
    rows = [(1, 0.99, 0.5), (2, 1.01, 0.5)]
    got = _run(spark, rows, delta=1.0)
    assert got[1] == 2
    assert got[3] == 2 * 200**2
    assert got == _mirror(rows)


def test_validation(spark):
    with pytest.raises(ValueError, match="integral"):
        _run(spark, [(1, 0.5, 0.5)], delta=0.33333)
    with pytest.raises(ValueError, match="positive spans"):
        _run(spark, [(1, 0.5, 0.5)], bbox=(5.0, 0.0, 1.0, 1.0))


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(3030)
    rows = [
        (i, rng.uniform(0.0, 10.0), rng.uniform(0.0, 10.0))
        for i in range(150)
    ]
    got = _run(spark, rows, delta=1.0)
    assert got == _mirror(rows, delta=1.0)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, lon DOUBLE, "
                "lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(spatial.clark_evans2_sql(
        "t", 1.0, BBOX
    )).fetchall()
    assert tuple(out[0]) == got

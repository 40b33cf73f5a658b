"""HMM map-matching (spatial.viterbi_match) — hysteresis beats
per-point flip-flop, the adjacency tier steers junctions, zero
penalties degenerate to snap_to_segments, unmatched points drop,
validation, random ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("vit-tests", master="local[4]",
                    shuffle_partitions=8)


PTS = "entity long, seq long, lon double, lat double"
SEGS = "seg_id long, lon1 double, lat1 double, lon2 double, lat2 double"


def _run(spark, pts, segs, pen_adj, pen_far, **kw):
    p = spark.createDataFrame(pts, PTS)
    s = spark.createDataFrame(segs, SEGS)
    out = spatial.viterbi_match(
        p, s, 0.25, pen_adj, pen_far, **kw
    ).collect()
    return sorted((r.entity, r.seq, r.seg_id, r.d2_q) for r in out)


def _twin(pts, segs, pen_adj, pen_far, **kw):
    con = duckdb.connect()
    con.execute("CREATE TABLE p(entity BIGINT, seq BIGINT, "
                "lon DOUBLE, lat DOUBLE)")
    con.execute("CREATE TABLE s(seg_id BIGINT, lon1 DOUBLE, "
                "lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?, ?)", pts)
    con.executemany("INSERT INTO s VALUES (?, ?, ?, ?, ?)", segs)
    out = con.execute(spatial.viterbi_match_sql(
        "p", "s", 0.25, pen_adj, pen_far, **kw
    )).fetchall()
    return sorted(tuple(r) for r in out)


# two parallel non-adjacent roads 0.2° apart
PARALLEL = [
    (1, 0.0, 0.0, 2.0, 0.0),
    (2, 0.0, 0.2, 2.0, 0.2),
]
# track biased toward road 1 but with one fix nearer road 2
WOBBLE = [
    (7, 0, 0.5, 0.09), (7, 1, 0.75, 0.11),
    (7, 2, 1.0, 0.05), (7, 3, 1.25, 0.09),
]


def test_hysteresis_keeps_one_road(spark):
    got = _run(spark, WOBBLE, PARALLEL, 10**9, 10**9)
    assert [r[2] for r in got] == [1, 1, 1, 1]
    assert got == _twin(WOBBLE, PARALLEL, 10**9, 10**9)


def test_zero_penalty_flip_flops(spark):
    got = _run(spark, WOBBLE, PARALLEL, 0, 0)
    assert [r[2] for r in got] == [1, 2, 1, 1]
    assert got == _twin(WOBBLE, PARALLEL, 0, 0)


def test_adjacency_tier_steers_junction(spark):
    segs = [
        (5, 0.0, 0.0, 1.0, 0.0),    # A
        (9, 1.0, 0.0, 2.0, 0.0),    # B, shares (1,0) with A
        (3, 1.0, 0.4, 2.0, 0.4),    # E, same distance, NOT adjacent
    ]
    pts = [(1, 0, 0.5, 0.0), (1, 1, 1.5, 0.2)]
    # point 1 is exactly between B and E (d = 0.2 both); adjacency
    # makes B cheaper despite E's smaller id
    got = _run(spark, pts, segs, 10**6, 10**8)
    assert [r[2] for r in got] == [5, 9]
    # with a flat penalty the (cost, seg_id) tie rule prefers E
    flat = _run(spark, pts, segs, 10**6, 10**6)
    assert [r[2] for r in flat] == [5, 3]
    assert got == _twin(pts, segs, 10**6, 10**8)
    assert flat == _twin(pts, segs, 10**6, 10**6)


def test_unmatched_points_drop_chain_continues(spark):
    pts = [(1, 0, 0.5, 0.01), (1, 1, 50.0, 50.0), (1, 2, 1.5, 0.01)]
    got = _run(spark, pts, PARALLEL, 10**6, 10**7)
    assert [r[1] for r in got] == [0, 2]
    assert [r[2] for r in got] == [1, 1]
    assert got == _twin(pts, PARALLEL, 10**6, 10**7)


def test_validation(spark):
    with pytest.raises(ValueError, match="penalties"):
        _run(spark, WOBBLE, PARALLEL, 5, 1)
    with pytest.raises(ValueError, match="k_candidates"):
        _run(spark, WOBBLE, PARALLEL, 0, 0, k_candidates=9)


def test_random_vs_twin_and_snap_degeneracy(spark):
    rng = random.Random(555)
    # sparse lattice: 6 chains of 4 abutting segments on 1°-apart rows
    segs = []
    sid = 0
    for row in range(3):
        for chain in range(2):
            x0 = chain * 3.0
            for j in range(4):
                segs.append((sid, x0 + j * 0.25, float(row),
                             x0 + (j + 1) * 0.25, float(row)))
                sid += 1
    pts = []
    for e in range(8):
        row = e % 3
        x = rng.randrange(0, 16) * 0.25
        for q in range(rng.randrange(2, 7)):
            pts.append((e, q,
                        x + q * 0.125 + rng.randrange(-2, 3) * 0.03125,
                        row + rng.randrange(-3, 4) * 0.03125))
    got = _run(spark, pts, segs, 10**5, 10**7)
    assert got == _twin(pts, segs, 10**5, 10**7)
    # pen = 0 degenerates to the verified independent snap
    free = _run(spark, pts, segs, 0, 0, k_candidates=8)
    p = spark.createDataFrame(
        [(e * 1000 + q, lo, la) for e, q, lo, la in pts],
        "point_id long, lon double, lat double",
    )
    s = spark.createDataFrame(segs, SEGS)
    snap = {
        (r.point_id // 1000, r.point_id % 1000): (r.seg_id, r.d2_q)
        for r in spatial.snap_to_segments(p, s, 0.25).collect()
    }
    assert {(e, q): (g, d) for e, q, g, d in free} == snap

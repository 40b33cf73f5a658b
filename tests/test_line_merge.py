"""Segment stitching (spatial.line_merge) — paths, rings, junctions,
lollipops, zero-length segments, random chain soup ≡ Python mirror ≡
recursive-closure twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("linemerge-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = ("seg_id long, lon1 double, lat1 double, "
          "lon2 double, lat2 double")


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = spatial.line_merge(df).collect()
    return {r.chain_id: (r.n_segments, r.n_points, r.n_open_ends,
                         r.is_ring)
            for r in out}


def _mirror(rows):
    # union-find over exact quantized endpoints
    scale = 10_000
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    def key(lon, lat):
        return (round(lon * scale), round(lat * scale))

    ep_segs = {}
    for sid, lon1, lat1, lon2, lat2 in rows:
        parent.setdefault(sid, sid)
        for k in (key(lon1, lat1), key(lon2, lat2)):
            ep_segs.setdefault(k, []).append(sid)
    for sids in ep_segs.values():
        for s in sids[1:]:
            union(sids[0], s)
    out = {}
    for sid, *_ in rows:
        out.setdefault(find(sid), [set(), set(), 0])
    for sid, lon1, lat1, lon2, lat2 in rows:
        c = out[find(sid)]
        c[0].add(sid)
        c[1].add(key(lon1, lat1))
        c[1].add(key(lon2, lat2))
    for k, sids in ep_segs.items():
        if len(sids) == 1:
            out[find(sids[0])][2] += 1
    return {
        min(c[0]): (len(c[0]), len(c[1]), c[2], c[2] == 0)
        for c in out.values()
    }


def test_open_path(spark):
    # 3 segments in a row: 4 points, 2 open ends
    rows = [(i, float(i), 0.0, float(i + 1), 0.0) for i in range(3)]
    assert _run(spark, rows) == {0: (3, 4, 2, False)}


def test_ring(spark):
    rows = [
        (0, 0.0, 0.0, 1.0, 0.0),
        (1, 1.0, 0.0, 1.0, 1.0),
        (2, 1.0, 1.0, 0.0, 0.0),
    ]
    assert _run(spark, rows) == {0: (3, 3, 0, True)}


def test_junction_and_separate_chain(spark):
    # Y junction (3 open ends) + an unconnected 1-segment chain
    rows = [
        (0, 0.0, 0.0, 1.0, 0.0),
        (1, 1.0, 0.0, 2.0, 0.0),
        (2, 1.0, 0.0, 1.0, 1.0),   # branches off the shared point
        (9, 50.0, 50.0, 51.0, 50.0),
    ]
    got = _run(spark, rows)
    assert got[0] == (3, 4, 3, False)
    assert got[9] == (1, 2, 2, False)


def test_lollipop(spark):
    # ring + a tail: one open end
    rows = [
        (0, 0.0, 0.0, 1.0, 0.0),
        (1, 1.0, 0.0, 0.0, 1.0),
        (2, 0.0, 1.0, 0.0, 0.0),
        (3, 0.0, 0.0, -1.0, -1.0),  # tail
    ]
    assert _run(spark, rows) == {0: (4, 4, 1, False)}


def test_zero_length_segment(spark):
    # degenerate: both ends one point → 1 point, degree 2, ring-like
    rows = [(5, 2.0, 2.0, 2.0, 2.0)]
    assert _run(spark, rows) == {5: (1, 1, 0, True)}


def test_random_soup_vs_mirror_and_twin(spark):
    rng = random.Random(31337)
    rows = []
    sid = 0
    # chains of random length on a 1/16° lattice, some closed
    for g in range(25):
        length = rng.randrange(1, 8)
        base_x, base_y = rng.randrange(100), rng.randrange(100)
        pts = [(base_x + i, base_y) for i in range(length + 1)]
        if rng.random() < 0.3 and length >= 3:
            pts[-1] = pts[0]
        for a, b in zip(pts, pts[1:]):
            rows.append((sid, a[0] * 0.0625, a[1] * 0.0625,
                         b[0] * 0.0625, b[1] * 0.0625))
            sid += 1
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE s(seg_id BIGINT, lon1 DOUBLE, "
                "lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?, ?, ?)", rows)
    out = con.execute(spatial.line_merge_sql("s")).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

"""8-ray viewshed (spatial.raster_viewshed) — hand-planted skyline
along one ray (block, reveal-behind-taller, first-always-visible),
pole clamp, lon wrap, empty-cell height 0, random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("viewshed-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 0.25
COLS = int(360 / RES)
ROWS = int(180 / RES)
SCALE = 1 << 20


def _cell(xb, yb):
    return yb * COLS + xb


def _run(spark, heights, observer_cells, radius=5):
    raster = spark.createDataFrame(
        list(heights.items()), "cell long, n_pages long"
    )
    obs = spark.createDataFrame(
        [(c,) for c in observer_cells], "cell long"
    )
    out = spatial.raster_viewshed(raster, obs, radius=radius).collect()
    return {
        (r.observer_cell, r.dir, r.step):
            (r.target_cell, r.height, r.slope_q, r.visible)
        for r in out
    }


def _mirror(heights, observer_cells, radius=5):
    out = {}
    for oc in observer_cells:
        ho = heights.get(oc, 0)
        xb, yb = oc % COLS, oc // COLS
        for d, (dx, dy) in enumerate(spatial.VIEWSHED_DIRS):
            best = None
            for s in range(1, radius + 1):
                ty = yb + dy * s
                if not 0 <= ty < ROWS:
                    continue
                tx = (xb + dx * s) % COLS
                tc = ty * COLS + tx
                h = heights.get(tc, 0)
                num = (h - ho) * SCALE
                sq = -((-num) // s) if num < 0 else num // s
                vis = best is None or sq > best
                if best is None or sq > best:
                    best = sq
                out[(oc, d, s)] = (tc, h, sq, vis)
    return out


def test_skyline_block_and_reveal(spark):
    # east ray (dir 0): heights 5, 20, 10, 31, 25 from an observer
    # of height 10: 5 visible (first), 20 visible (higher angle),
    # 10 blocked, 31 visible (5.25 > 5 — height 30 would TIE at
    # exactly 5 and strictness blocks it), 25 blocked
    oc = _cell(100, 300)
    hts = {oc: 10}
    for s, h in enumerate([5, 20, 10, 31, 25], start=1):
        hts[_cell(100 + s, 300)] = h
    got = _run(spark, hts, [oc], radius=5)
    vis = [got[(oc, 0, s)][3] for s in range(1, 6)]
    assert vis == [True, True, False, True, False]


def test_first_step_always_visible(spark):
    oc = _cell(10, 10)
    got = _run(spark, {oc: 100}, [oc], radius=3)
    assert all(got[(oc, d, 1)][3] for d in range(8))


def test_pole_clamp_and_wrap(spark):
    # observer on the top row: northward rays vanish; at xb=0 the
    # west ray wraps to the other lon edge
    oc = _cell(0, ROWS - 1)
    got = _run(spark, {oc: 1}, [oc], radius=2)
    ups = [k for k in got if k[1] in (1, 2, 3)]   # dy=+1 dirs
    assert ups == []
    assert got[(oc, 4, 1)][0] == _cell(COLS - 1, ROWS - 1)


def test_empty_cells_height_zero(spark):
    oc = _cell(50, 50)
    got = _run(spark, {oc: 5}, [oc], radius=2)
    assert got[(oc, 0, 1)][1] == 0


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(2468)
    heights = {}
    for _ in range(300):
        heights[_cell(rng.randrange(200, 260),
                      rng.randrange(200, 260))] = rng.randrange(1, 100)
    observers = rng.sample(sorted(heights), 5)
    got = _run(spark, heights, observers, radius=8)
    assert got == _mirror(heights, observers, radius=8)
    con = duckdb.connect()
    con.execute("CREATE TABLE r(cell BIGINT, n_pages BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?)",
                    list(heights.items()))
    con.execute("CREATE TABLE o(cell BIGINT)")
    con.executemany("INSERT INTO o VALUES (?)",
                    [(c,) for c in observers])
    out = con.execute(spatial.raster_viewshed_sql(
        "r", "o", radius=8
    )).fetchall()
    assert {
        (r[0], r[1], r[2]): (r[3], r[4], r[5], r[6]) for r in out
    } == got

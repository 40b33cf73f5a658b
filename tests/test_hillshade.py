"""Analytic hillshade (spatial.raster_hillshade) — flat-cell
closed form, toward/away-from-light asymmetry, bounds, validation,
random ≡ math.isqrt mirror ≡ DuckDB composed twin."""

import math
import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial
from openstreetmap_license_change_spark.operators.spatial import (
    HILLSHADE_LIGHT,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("hillshade-tests", master="local[4]",
                    shuffle_partitions=8)


RES = 30.0   # 12 x 6 world grid
COLS, ROWS = 12, 6


def _run(spark, cells, **kw):
    df = spark.createDataFrame(cells, "cell long, v long")
    out = spatial.raster_hillshade(df, "v", res_deg=RES, **kw)
    return {r.cell: (r.gx, r.gy, r.shade_ppm) for r in out.collect()}


def _mirror(cells, z_scale=1, light=HILLSHADE_LIGHT):
    lx, ly, lz = light
    l2 = lx * lx + ly * ly + lz * lz
    grid = {c: v for c, v in cells}

    def val(r, l):
        if not 0 <= r < ROWS:
            return 0
        return grid.get(r * COLS + l % COLS, 0)

    out = {}
    for c in grid:
        r, l = divmod(c, COLS)
        gx = val(r, l + 1) - val(r, l - 1)
        gy = val(r + 1, l) - val(r - 1, l)
        dot = -gx * lx - gy * ly + z_scale * lz
        n2 = gx * gx + gy * gy + z_scale * z_scale
        q = (dot * dot * 10**12) // (n2 * l2)
        s = math.isqrt(q)
        out[c] = (gx, gy, -s if dot < 0 else s)
    return out


def test_flat_raster_closed_form(spark):
    cells = [(r * COLS + l, 7) for r in range(2, 5) for l in range(3, 6)]
    got = _run(spark, cells)
    lx, ly, lz = HILLSHADE_LIGHT
    l2 = lx * lx + ly * ly + lz * lz
    flat = math.isqrt((lz * lz * 10**12) // l2)
    # interior cell (3,4): all four neighbors present and equal
    assert got[3 * COLS + 4] == (0, 0, flat)
    assert abs(flat - 707_106) <= 1   # ≈ cos(45°)·1e6
    assert got == _mirror(cells)


def test_slope_toward_light_brighter(spark):
    # value rises to the SE ⇒ downhill faces NW = toward the light
    cells = [(2 * COLS + 4, 10), (2 * COLS + 6, 30),
             (1 * COLS + 5, 25), (3 * COLS + 5, 5),
             (2 * COLS + 5, 20)]
    got = _run(spark, cells)
    mid = got[2 * COLS + 5]
    assert mid[0] > 0 and mid[1] < 0          # gx > 0, gy < 0
    flat = _mirror([(0, 1)])[0][2]
    assert mid[2] > flat                      # brighter than flat
    # mirrored tilt: value rises to the NW ⇒ faces away, darker
    cells2 = [(2 * COLS + 4, 30), (2 * COLS + 6, 10),
              (1 * COLS + 5, 5), (3 * COLS + 5, 25),
              (2 * COLS + 5, 20)]
    got2 = _run(spark, cells2)
    assert got2[2 * COLS + 5][2] < flat
    assert got == _mirror(cells)
    assert got2 == _mirror(cells2)


def test_bounds_and_sign(spark):
    rng = random.Random(99)
    cells = [(r * COLS + l, rng.randrange(0, 1000))
             for r in range(ROWS) for l in range(COLS)]
    got = _run(spark, cells, z_scale=3)
    for gx, gy, s in got.values():
        assert -10**6 <= s <= 10**6
    assert got == _mirror(cells, z_scale=3)


def test_validation(spark):
    df = spark.createDataFrame([(0, 1)], "cell long, v long")
    with pytest.raises(ValueError, match="z_scale"):
        spatial.raster_hillshade(df, "v", res_deg=RES, z_scale=0)
    with pytest.raises(ValueError, match="altitude"):
        spatial.raster_hillshade(df, "v", res_deg=RES,
                                 light=(1, 1, 0))


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(2024)
    cells = sorted(
        {(rng.randrange(ROWS) * COLS + rng.randrange(COLS),)
         for _ in range(40)}
    )
    cells = [(c, rng.randrange(-500, 2000)) for (c,) in cells]
    got = _run(spark, cells, z_scale=2)
    assert got == _mirror(cells, z_scale=2)

    con = duckdb.connect()
    con.execute("CREATE TABLE r(cell BIGINT, v BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?)", cells)
    out = con.execute(spatial.raster_hillshade_sql(
        "r", "v", res_deg=RES, z_scale=2
    )).fetchall()
    assert {r[0]: (r[1], r[2], r[3]) for r in out} == got


def test_gradient_overflow_guard_raises(spark):
    """Round-6 fix: a gradient outside the derived decimal(38)
    envelope (~1e7 at the default light) raises loudly instead of
    silently nulling where DuckDB would error."""
    import pytest as _pytest

    # central difference over neighbours: a huge value step produces
    # |g| beyond the guard ((1e13 - z*lz) / (|lx|+|ly|) ≈ 1e7)
    cells = [(30, 0), (31, 4 * 10**13), (29, -4 * 10**13),
             (18, 0), (42, 0)]
    with _pytest.raises(Exception, match="overflow-safe envelope"):
        _run(spark, cells)


def test_gradient_inside_envelope_passes_guard(spark):
    """Values just inside the envelope still shade (guard is not
    over-tight)."""
    cells = [(30, 0), (31, 10**6), (29, -(10**6)),
             (18, 0), (42, 0)]
    got = _run(spark, cells)
    assert 30 in got

"""Mask connected-component labeling (multimodal.mask_components) —
planted blob/U-shape/wrap/diagonal semantics, serpentine pointer-
jumping convergence, random masks ≡ flood-fill mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("maskcc-tests", master="local[4]",
                    shuffle_partitions=8)


def _grid_to_runs(mask_id, grid):
    """Flat row-major RLE runs (may wrap rows) from '#'/'.' rows —
    the same transition-scan semantics as mask_rle_encode."""
    w = len(grid[0])
    flat = "".join(grid)
    runs, i, idx = [], 0, 0
    while i < len(flat):
        if flat[i] == "#":
            j = i
            while j < len(flat) and flat[j] == "#":
                j += 1
            idx += 1
            runs.append((mask_id, idx, i, j - i))
            i = j
        else:
            i += 1
    return runs, w, len(grid)


def _flood_components(grid):
    """Pixel-truth 4-connectivity components."""
    h, w = len(grid), len(grid[0])
    seen = set()
    comps = []
    for y in range(h):
        for x in range(w):
            if grid[y][x] == "#" and (y, x) not in seen:
                stack, px = [(y, x)], []
                seen.add((y, x))
                while stack:
                    cy, cx = stack.pop()
                    px.append((cy, cx))
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < h and 0 <= nx < w
                                and grid[ny][nx] == "#"
                                and (ny, nx) not in seen):
                            seen.add((ny, nx))
                            stack.append((ny, nx))
                comps.append(px)
    out = []
    for px in comps:
        # comp id = smallest segment-start flat offset: the min flat
        # offset that begins a row segment
        seg_starts = {
            y * w + x for y, x in px
            if x == 0 or (y, x - 1) not in px_set(px)
        }
        out.append((
            min(seg_starts),
            len(px),
            len(seg_starts),
            min(x for _, x in px), max(x for _, x in px),
            min(y for y, _ in px), max(y for y, _ in px),
        ))
    return sorted(out)


def px_set(px):
    return set(px)


def _run(spark, masks, w, h):
    rows = []
    for mid, grid in masks.items():
        runs, _, _ = _grid_to_runs(mid, grid)
        rows.extend(runs)
    df = spark.createDataFrame(
        rows, "mask_id long, run_idx long, start_px long, run_len long"
    )
    out = multimodal.mask_components(df, width=w, height=h).collect()
    got = {}
    for r in out:
        got.setdefault(r.mask_id, []).append(
            (r.comp_px, r.area_px, r.n_segs,
             r.x_min, r.x_max, r.y_min, r.y_max)
        )
    return {k: sorted(v) for k, v in got.items()}


def test_two_blobs(spark):
    grid = ["##..#",
            "##..#",
            "....."]
    got = _run(spark, {0: grid}, 5, 3)
    assert got[0] == _flood_components(grid)
    assert len(got[0]) == 2
    assert {c[1] for c in got[0]} == {4, 2}


def test_u_shape_single_component(spark):
    grid = ["#.#",
            "#.#",
            "###"]
    got = _run(spark, {0: grid}, 3, 3)
    assert len(got[0]) == 1
    assert got[0][0][1] == 7


def test_wrapping_run_not_connected(spark):
    # one FLAT run spans (0,2) and (1,0) — pixels not 4-adjacent
    grid = ["..#",
            "#.."]
    runs, w, h = _grid_to_runs(0, grid)
    assert len(runs) == 1  # it really is one flat run
    got = _run(spark, {0: grid}, w, h)
    assert len(got[0]) == 2


def test_diagonal_not_connected(spark):
    grid = ["#.",
            ".#"]
    got = _run(spark, {0: grid}, 2, 2)
    assert len(got[0]) == 2


def test_serpentine_converges_single_component(spark):
    # boustrophedon: a single snake component with a long diameter —
    # pointer jumping must converge inside default max_iters
    w, h = 16, 16
    grid = []
    for y in range(h):
        if y % 2 == 0:
            grid.append("#" * w)
        else:
            grid.append(("." * (w - 1) + "#") if (y // 2) % 2 == 0
                        else ("#" + "." * (w - 1)))
    got = _run(spark, {0: grid}, w, h)
    assert len(got[0]) == 1
    assert got[0][0][1] == sum(r.count("#") for r in grid)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(616)
    w, h = 12, 9
    masks = {}
    for m in range(6):
        masks[m] = [
            "".join("#" if rng.random() < 0.45 else "."
                    for _ in range(w))
            for _ in range(h)
        ]
    got = _run(spark, masks, w, h)
    for m, grid in masks.items():
        assert got.get(m, []) == _flood_components(grid), m
    # twin from the pixel set
    con = duckdb.connect()
    con.execute("CREATE TABLE fg(mask_id BIGINT, px BIGINT)")
    rows = [
        (m, y * w + x)
        for m, grid in masks.items()
        for y in range(h) for x in range(w) if grid[y][x] == "#"
    ]
    con.executemany("INSERT INTO fg VALUES (?, ?)", rows)
    out = con.execute(
        multimodal.mask_components_sql("fg", width=w)
    ).fetchall()
    twin = {}
    for r in out:
        twin.setdefault(r[0], []).append(tuple(r[1:]))
    assert {k: sorted(v) for k, v in twin.items()} == got

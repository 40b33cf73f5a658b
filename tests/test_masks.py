"""Segmentation-mask RLE + pairwise IoU (multimodal.mask_rle_encode /
mask_iou_pairs) — planted runs with closed forms, owner-bucket dedupe
invariance, flat-order merge semantics, and DuckDB twin parity from
the foreground pixel set."""

import random

import duckdb
import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal

M = 1_000_000


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("mask-tests", master="local[4]",
                    shuffle_partitions=8)


def _mask_df(spark, masks, w, h):
    """masks: {mask_id: iterable of foreground flat offsets}."""
    rows = []
    for mid, fg in masks.items():
        buf = np.zeros(w * h, dtype=np.uint8)
        buf[list(fg)] = 1
        rows.append((mid, bytes(buf.tobytes()), w, h))
    return spark.createDataFrame(rows, multimodal.MASK_SCHEMA)


def _rle(spark, masks, w=8, h=4):
    df = multimodal.mask_rle_encode(_mask_df(spark, masks, w, h))
    out = {}
    for r in df.collect():
        out.setdefault(r.mask_id, []).append(
            (r.run_idx, r.start_px, r.run_len)
        )
    return {k: sorted(v) for k, v in out.items()}


def test_rle_planted_runs(spark):
    got = _rle(spark, {7: [1, 2, 4]}, w=5, h=1)
    assert got == {7: [(1, 1, 2), (2, 4, 1)]}


def test_rle_merges_across_row_boundary(spark):
    """Row-major flat RLE merges a run ending at a row's last pixel
    with one starting at the next row's first pixel — the COCO-order
    convention (theirs column-major, ours row-major)."""
    got = _rle(spark, {1: [6, 7, 8, 9]}, w=8, h=2)
    assert got == {1: [(1, 6, 4)]}


def test_rle_all_zero_absent_all_one_single_run(spark):
    got = _rle(spark, {1: [], 2: range(32)}, w=8, h=4)
    assert 1 not in got
    assert got[2] == [(1, 0, 32)]


def test_rle_matches_gaps_and_islands_twin(spark):
    rng = random.Random(3)
    masks = {
        m: sorted(rng.sample(range(64), rng.randrange(5, 40)))
        for m in range(6)
    }
    got = _rle(spark, masks, w=8, h=8)
    con = duckdb.connect()
    con.execute("CREATE TABLE fg(mask_id BIGINT, px BIGINT)")
    con.executemany(
        "INSERT INTO fg VALUES (?, ?)",
        [(m, p) for m, fg in masks.items() for p in fg],
    )
    want = {}
    for mid, ridx, s, ln in con.execute(
        multimodal.mask_rle_runs_sql("fg")
    ).fetchall():
        want.setdefault(mid, []).append((ridx, s, ln))
    want = {k: sorted(v) for k, v in want.items()}
    assert got == want


def _iou(spark, runs, bucket=256):
    df = spark.createDataFrame(runs, multimodal.MASK_RLE_SCHEMA)
    out = multimodal.mask_iou_pairs(df, bucket=bucket).collect()
    return {
        (r.mask_a, r.mask_b): (r.area_a, r.area_b, r.inter_px,
                               r.union_px, r.iou_ppm)
        for r in out
    }


def test_iou_planted_overlap(spark):
    runs = [(1, 1, 0, 10), (2, 1, 5, 10)]
    got = _iou(spark, runs)
    assert got == {(1, 2): (10, 10, 5, 15, (5 * M) // 15)}


def test_iou_identical_and_disjoint(spark):
    runs = [(1, 1, 0, 8), (2, 1, 0, 8), (3, 1, 100, 8)]
    got = _iou(spark, runs)
    assert got[(1, 2)] == (8, 8, 8, 8, M)
    assert (1, 3) not in got and (2, 3) not in got


def test_iou_owner_bucket_dedupe(spark):
    """Two long runs overlapping across many blocks must count the
    overlap once — bucket=4 equals the single-block bucket=4096."""
    runs = [(1, 1, 0, 100), (2, 1, 37, 100), (1, 2, 200, 40),
            (2, 2, 210, 10)]
    fine = _iou(spark, runs, bucket=4)
    coarse = _iou(spark, runs, bucket=4096)
    assert fine == coarse
    a1, a2 = 140, 110
    inter = (100 - 37) + 10
    assert fine[(1, 2)] == (
        a1, a2, inter, a1 + a2 - inter,
        (inter * M) // (a1 + a2 - inter),
    )


def test_end_to_end_synthetic_matches_pixel_twin(spark):
    """synthetic_masks → RLE → interval IoU equals the pixel-level
    DuckDB twin computed from the closed-form foreground set."""
    n, w, h = 8, 24, 16
    media = multimodal.synthetic_masks(spark, n=n, w=w, h=h)
    runs = multimodal.mask_rle_encode(media)
    got = {
        (r.mask_a, r.mask_b): (r.area_a, r.area_b, r.inter_px,
                               r.union_px, r.iou_ppm)
        for r in multimodal.mask_iou_pairs(runs, bucket=32).collect()
    }
    con = duckdb.connect()
    fgpx = f"""(
        SELECT m.range AS mask_id, y.range * {w} + x.range AS px
        FROM range({n}) m, range({h}) y, range({w}) x
        WHERE (x.range * 3 + y.range * 7 + m.range * 13) % 256 < 96
    )"""
    want = {
        (a, b): rest
        for a, b, *rest in [
            (r[0], r[1], tuple(r[2:]))
            for r in con.execute(
                multimodal.mask_iou_sql(fgpx)
            ).fetchall()
        ]
    }
    want = {k: v[0] for k, v in want.items()}
    assert got == want
    # sanity: stripes with shifted phase overlap but are not equal
    assert any(0 < v[4] < M for v in got.values())


def test_bucket_validated(spark):
    runs = spark.createDataFrame([], multimodal.MASK_RLE_SCHEMA)
    with pytest.raises(ValueError):
        multimodal.mask_iou_pairs(runs, bucket=0)

"""Otsu threshold (multimodal.image_otsu): hand-computed tiny image,
bimodal plant, constant-image exclusion, exact-fraction Python mirror
(verifying the 2²⁰ quantization picks the true argmax on these
inputs), and DuckDB twin parity on the synthetic closed form."""

from fractions import Fraction

import duckdb
import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("otsu-tests", master="local[4]",
                    shuffle_partitions=8)


def _media(spark, imgs):
    """imgs: list of (media_id, np.uint8 array of shape (h, w, 3))."""
    rows = [
        (int(mid), f"media://{mid}", "image", a.tobytes(),
         int(a.shape[1]), int(a.shape[0]), 0, "rgb24/raw")
        for mid, a in imgs
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_hand_computed_two_pixel(spark):
    img = np.array([[[0, 0, 0], [1, 1, 1]]], dtype=np.uint8)  # luma 0, 3
    got = mm.image_otsu(_media(spark, [(7, img)])).collect()
    assert len(got) == 1
    r = got[0]
    # t=0: wB=1, sB=0, d = 0*2 - 3*1 = -3, q = 9<<20 // 1 = 9437184
    assert (r.media_id, r.threshold, r.w_below, r.sum_below, r.score_q) \
        == (7, 0, 1, 0, 9 << 20)


def test_bimodal_and_constant(spark):
    dark = np.zeros((4, 8, 3), dtype=np.uint8)
    bright = np.full((4, 8, 3), 200, dtype=np.uint8)
    bimodal = np.concatenate([dark[:, :4], bright[:, :4]], axis=1)
    flat = np.full((4, 8, 3), 99, dtype=np.uint8)
    got = {r.media_id: r
           for r in mm.image_otsu(
               _media(spark, [(1, bimodal), (2, flat)])).collect()}
    assert 2 not in got                       # constant image: no split
    assert got[1].threshold == 0              # lowest level of dark mode
    assert got[1].w_below == 16 and got[1].sum_below == 0


def _py_otsu_exact(a):
    """Argmax of the TRUE fraction (no quantization), lowest-t ties."""
    gray = a.astype(np.int64).sum(axis=2).ravel()
    counts = np.bincount(gray, minlength=766)
    big_w, big_s = int(gray.size), int(gray.astype(np.int64).sum())
    best_t, best = None, Fraction(-1)
    for g in np.nonzero(counts)[0]:
        wb = int(np.cumsum(counts)[g])
        if wb in (0, big_w):
            continue
        sb = int((counts[: g + 1] * np.arange(g + 1)).sum())
        d = sb * big_w - big_s * wb
        f = Fraction(d * d, wb * (big_w - wb))
        if f > best:
            best, best_t = f, int(g)
    return best_t


def test_random_vs_exact_fraction_mirror(spark):
    rng = np.random.default_rng(4461)
    imgs = [
        (i, rng.integers(0, 256, size=(8, 12, 3), dtype=np.int64)
            .astype(np.uint8))
        for i in range(12)
    ]
    got = {r.media_id: r.threshold
           for r in mm.image_otsu(_media(spark, imgs)).collect()}
    assert got == {i: _py_otsu_exact(a) for i, a in imgs}


def test_twin_parity_synthetic(spark):
    media = mm.synthetic_raw_rgb_media(spark, n=16, w=48, h=32)
    got = sorted(tuple(r) for r in mm.image_otsu(media).collect())
    twin = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(mm.image_otsu_sql(16, 48, 32))
        .fetchall()
    )
    assert got == twin
    assert len(got) == 16

"""Exact histogram equalization (multimodal.image_equalize) — planted
skewed/constant/two-level images vs a pure-Python pixel mirror,
LUT range/monotonicity properties, and randomized parity."""

import random

import numpy as np
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("equalize-tests", master="local[4]",
                    shuffle_partitions=8)


def _media_df(spark, images):
    """images: list of (media_id, np.uint8 array (h, w, 3))."""
    rows = [
        (int(mid), f"media://{mid}", "image", img.tobytes(),
         int(img.shape[1]), int(img.shape[0]), 0, "rgb24/raw")
        for mid, img in images
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["media_id", "url", "media_type", "payload",
                 "meta_width", "meta_height", "meta_duration_ms",
                 "meta_codec"],
    )
    return spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)


def _py_equalize(img):
    gray = img.astype(np.int64).sum(axis=2).ravel()
    counts = np.bincount(gray, minlength=766)
    present = np.nonzero(counts)[0]
    cdf = np.cumsum(counts)[present]
    n = gray.size
    cdf_min = int(counts[present[0]])
    den = n - cdf_min
    out = []
    for g, c, cd in zip(present, counts[present], cdf):
        lut = 0 if den == 0 else (int(cd) - cdf_min) * 255 // den
        out.append((int(g), int(c), int(cd), lut))
    return out


def _collect(spark, images):
    rows = multimodal.image_equalize(_media_df(spark, images)).collect()
    out = {}
    for r in rows:
        out.setdefault(r["media_id"], []).append(
            (r["gray"], r["n_pixels"], r["cdf"], r["lut"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_constant_image_maps_to_zero(spark):
    img = np.full((4, 4, 3), 100, dtype=np.uint8)
    got = _collect(spark, [(1, img)])[1]
    assert got == [(300, 16, 16, 0)]


def test_two_level_image(spark):
    # 12 dark pixels (gray 0), 4 bright (gray 765)
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[0, :, :] = 255
    got = _collect(spark, [(5, img)])[5]
    # cdf_min = 12, N = 16, den = 4: dark → 0, bright → (16-12)*255//4=255
    assert got == [(0, 12, 12, 0), (765, 4, 16, 255)]


def test_full_range_and_monotone_on_random(spark):
    rng = np.random.RandomState(7)
    images = [
        (i, rng.randint(0, 256, size=(8, 6, 3)).astype(np.uint8))
        for i in range(6)
    ]
    got = _collect(spark, images)
    for mid, img in images:
        want = sorted(_py_equalize(img))
        assert got[mid] == want
        luts = [lut for _, _, _, lut in got[mid]]
        assert luts == sorted(luts)          # monotone
        assert luts[-1] == 255               # top level saturates
        assert all(0 <= v <= 255 for v in luts)


def test_skewed_histogram_stretches(spark):
    """A dark-skewed image must spread its few levels across [0,255]
    rather than staying compressed — the point of equalization."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 9, size=(16, 16, 3)).astype(np.uint8)  # gray ≤ 24
    got = _collect(spark, [(9, img)])[9]
    assert max(lut for _, _, _, lut in got) == 255
    assert min(g for g, _, _, _ in got) < 25  # inputs were compressed

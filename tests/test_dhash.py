"""Perceptual image dHash (multimodal.image_dhash) and banded Hamming
pairs (multimodal.dhash_pairs) — exact-integer block-mean hashing
(python mirror), the 2×-upscale invariance property (the reason a
content hash beats a byte hash), planted near-dup recovery, the
pigeonhole band guarantee, and guards."""

import numpy as np
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("dhash-tests", master="local[4]",
                    shuffle_partitions=8)


GW, GH = multimodal.DHASH_GRID_W, multimodal.DHASH_GRID_H


def _python_dhash(img):
    """img: (h, w, 3) uint8 — mirror of the exact block-mean dHash."""
    h, w = img.shape[:2]
    gray = img.astype(np.int64).sum(axis=2)
    xb = (np.arange(w) * GW) // w
    yb = (np.arange(h) * GH) // h
    sums = np.zeros((GH, GW), dtype=np.int64)
    cnts = np.zeros((GH, GW), dtype=np.int64)
    np.add.at(sums, (yb[:, None], xb[None, :]), gray)
    np.add.at(cnts, (yb[:, None], xb[None, :]), 1)
    hv = 0
    for r in range(GH):
        for c in range(GW - 1):
            if sums[r, c] * cnts[r, c + 1] > sums[r, c + 1] * cnts[r, c]:
                hv |= 1 << (r * (GW - 1) + c)
    return hv


def _media_df(spark, imgs):
    """imgs: {media_id: (h, w, 3) uint8 array} → MEDIA_SCHEMA frame."""
    rows = [
        (int(mid), f"media://{mid}", "image", img.tobytes(),
         img.shape[1], img.shape[0], 0, "rgb24/raw")
        for mid, img in imgs.items()
    ]
    return spark.createDataFrame(
        rows, schema=multimodal.MEDIA_SCHEMA
    )


def _gradient(mid, w=48, h=32):
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((x * 3 + y * 7 + c * 11 + mid * 13) % 256).astype(np.uint8)


def _spark_hashes(spark, imgs):
    out = multimodal.image_dhash(_media_df(spark, imgs)).collect()
    return {r["media_id"]: r["dhash"] for r in out}


def test_matches_python_mirror(spark):
    imgs = {i: _gradient(i) for i in range(6)}
    got = _spark_hashes(spark, imgs)
    assert got == {i: _python_dhash(img) for i, img in imgs.items()}
    assert all(0 <= v < (1 << 56) for v in got.values())


def test_upscale_invariance(spark):
    """Nearest-neighbor 2× upscale preserves every block MEAN exactly
    when block boundaries align (w multiple of 9, h multiple of 7 —
    each block's sum and count both ×4), so the dHash is IDENTICAL —
    the content-hash property a byte hash cannot have."""
    base = _gradient(3, w=45, h=28)
    up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    got = _spark_hashes(spark, {1: base, 2: up})
    assert got[1] == got[2]


def test_distinct_images_differ(spark):
    rng = np.random.RandomState(7)
    imgs = {
        1: rng.randint(0, 256, (32, 48, 3)).astype(np.uint8),
        2: rng.randint(0, 256, (32, 48, 3)).astype(np.uint8),
    }
    got = _spark_hashes(spark, imgs)
    assert got[1] != got[2]


def test_pairs_planted_near_dup(spark):
    """A lightly-perturbed copy pairs with its original within
    hamming 3; an unrelated random image does not."""
    rng = np.random.RandomState(42)
    base = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    tweaked = base.copy()
    tweaked[:2, :2] = 255          # small local edit
    other = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    hashes = multimodal.image_dhash(
        _media_df(spark, {1: base, 2: tweaked, 3: other})
    )
    pairs = multimodal.dhash_pairs(hashes, max_hamming=3, bands=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert (1, 3) not in got and (2, 3) not in got


def test_pairs_equal_brute_force(spark):
    """Band candidates + filter == brute-force hamming ≤ t over all
    pairs (the pigeonhole superset is exact, never lossy)."""
    rng = np.random.RandomState(11)
    imgs = {i: rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
            for i in range(12)}
    # force near-dups: clones of image 0 with tiny edits
    for j in (20, 21):
        cl = imgs[0].copy()
        cl[0, j - 20] = 0
        imgs[j] = cl
    hashes_map = {
        i: _python_dhash(img) for i, img in imgs.items()
    }
    want = {
        (a, b): bin(hashes_map[a] ^ hashes_map[b]).count("1")
        for a in hashes_map for b in hashes_map
        if a < b and bin(hashes_map[a] ^ hashes_map[b]).count("1") <= 3
    }
    hashes = multimodal.image_dhash(_media_df(spark, imgs))
    pairs = multimodal.dhash_pairs(hashes, max_hamming=3, bands=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got == want


def test_guards(spark):
    df = _media_df(spark, {1: _gradient(1)})
    hashes = multimodal.image_dhash(df)
    with pytest.raises(ValueError, match="pigeonhole"):
        multimodal.dhash_pairs(hashes, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="bands"):
        multimodal.dhash_pairs(hashes, bands=0)

"""Luma-histogram earth-mover pairs (multimodal.hist_emd_pairs) —
exact 1-D EMD semantics on planted payloads, inclusive threshold,
band-join completeness vs a Python all-pairs brute mirror, DuckDB
twin parity over the synthetic closed form."""

import random

import duckdb
import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("histemd-tests", master="local[4]",
                    shuffle_partitions=8)


W, H = 48, 32


def _media(spark, payloads):
    rows = [
        (int(i), f"media://{i}", "image", bytes(p), W, H, 0, "rgb24/raw")
        for i, p in payloads.items()
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def _flat(value_rgb):
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :] = value_rgb
    return img.tobytes()


def _run(spark, payloads, T, n_bins=16):
    out = multimodal.hist_emd_pairs(
        _media(spark, payloads), n_bins=n_bins, max_emd_ppm=T
    ).collect()
    return {(r.media_a, r.media_b): r.emd_ppm for r in out}


def _brute(payloads, T, n_bins=16):
    pre = {}
    for i, p in payloads.items():
        img = np.frombuffer(p, np.uint8).astype(np.int64)
        gray = img.reshape(H, W, 3).sum(axis=2).ravel()
        cnt = np.bincount(gray * n_bins // 766, minlength=n_bins)
        h = cnt * 10**6 // cnt.sum()
        pre[i] = np.cumsum(h)[: n_bins - 1]
    out = {}
    ids = sorted(payloads)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            d = int(np.abs(pre[a] - pre[b]).sum())
            if d <= T:
                out[(a, b)] = d
    return out


def test_identical_images_zero_emd(spark):
    pay = {1: _flat((10, 20, 30)), 2: _flat((10, 20, 30)),
           3: _flat((200, 200, 200))}
    got = _run(spark, pay, T=100)
    assert got == {(1, 2): 0}


def test_far_histograms_cross_bucket(spark):
    """All-black vs all-white: emd = 15·10⁶ (full mass moved 15
    bins); found iff T admits it, and the m-buckets differ — the
    adjacent-bucket probe path."""
    pay = {1: _flat((0, 0, 0)), 2: _flat((255, 255, 255))}
    assert _run(spark, pay, T=16_000_000) == {(1, 2): 15_000_000}
    assert _run(spark, pay, T=10_000_000) == {}


def test_threshold_boundary_inclusive(spark):
    """Half the pixels one bin up: emd exactly 500000 ppm."""
    img = np.zeros((H, W, 3), np.uint8)
    img[: H // 2, :, 0] = 48  # gray 48 → bin 1; other half bin 0
    pay = {1: _flat((0, 0, 0)), 2: img.tobytes()}
    assert _run(spark, pay, T=500_000) == {(1, 2): 500_000}
    assert _run(spark, pay, T=499_999) == {}


def test_random_completeness_vs_brute(spark):
    """Random-noise images at several thresholds: the band join must
    equal the all-pairs brute mirror — completeness AND exactness."""
    rng = np.random.default_rng(29)
    pay = {}
    for i in range(14):
        base = rng.integers(0, 256, (H, W, 3))
        # cluster images into 2 brightness families for bucket variety
        if i % 2:
            base = base // 3
        pay[i] = base.astype(np.uint8).tobytes()
    for T in (50_000, 400_000, 2_000_000, 12_000_000):
        assert _run(spark, pay, T) == _brute(pay, T), f"T={T}"
    assert len(_brute(pay, 12_000_000)) > 20


def test_params(spark):
    with pytest.raises(ValueError, match="max_emd_ppm"):
        multimodal.hist_emd_sql(4, W, H, max_emd_ppm=0)
    with pytest.raises(ValueError, match="n_bins"):
        multimodal.image_luma_hist(None, n_bins=1)


def test_duckdb_twin_parity(spark):
    media = multimodal.synthetic_raw_rgb_media(spark, n=16, w=W, h=H)
    out = multimodal.hist_emd_pairs(
        media, n_bins=16, max_emd_ppm=300_000
    ).collect()
    got = {(r.media_a, r.media_b): r.emd_ppm for r in out}
    rows = duckdb.connect().execute(
        multimodal.hist_emd_sql(16, W, H, n_bins=16,
                                max_emd_ppm=300_000)
    ).fetchall()
    assert {(r[0], r[1]): r[2] for r in rows} == got
    assert len(got) > 0

"""Perceptual DCT hash (multimodal.image_phash) — frozen-constant
sanity, flat image degenerate, gradient images, edit-robustness vs
dHash story (noise flips fewer pHash bits), alignment guard, synth ≡
Fraction-free integer mirror ≡ twin."""

import duckdb
import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("phash-tests", master="local[4]",
                    shuffle_partitions=8)


def _media(spark, imgs):
    rows = [
        (mid, f"media://ph/{mid}", "image",
         np.asarray(a, dtype=np.uint8).tobytes(),
         a.shape[1], a.shape[0], 0, "rgb24/raw")
        for mid, a in imgs
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, url string, media_type string, "
        "payload binary, meta_width int, meta_height int, "
        "meta_duration_ms long, meta_codec string",
    )


def _run(spark, imgs):
    out = multimodal.image_phash(_media(spark, imgs)).collect()
    return {r.media_id: (r.phash, r.median_coef) for r in out}


def _mirror_one(a):
    m = np.asarray(multimodal.PHASH_DCT_M, dtype=object)
    gray = a.astype(object).sum(axis=2)
    h, w = gray.shape
    blocks = gray.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    coef = m @ blocks @ m.T
    ac = list(np.delete(coef.reshape(-1), 0))
    med = sorted(ac)[(len(ac) - 1) // 2]
    hv = 0
    for i, v in enumerate(ac):
        if v > med:
            hv |= 1 << i
    return hv, int(med)


def test_dct_constants_frozen(spark):
    assert multimodal.PHASH_DCT_M[0][0] == 5793      # 2^14/sqrt(8)
    assert multimodal.PHASH_DCT_M[1][0] == 8035      # cos(pi/16)/2
    assert multimodal.PHASH_DCT_M[4][0] == 5793      # cos(pi/4)/2


def test_flat_image_all_ac_zero(spark):
    a = np.full((16, 16, 3), 77, dtype=np.uint8)
    got = _run(spark, [(1, a)])
    # every AC coefficient is 0 → median 0, no strict exceeder
    assert got[1] == (0, 0)


def test_matches_integer_mirror(spark):
    rng = np.random.default_rng(3)
    imgs = [(i, rng.integers(0, 255, size=(32, 48, 3),
                             dtype=np.uint8).astype(np.uint8))
            for i in range(4)]
    got = _run(spark, imgs)
    for mid, a in imgs:
        assert got[mid] == _mirror_one(a)


def test_phash_robust_to_small_noise(spark):
    rng = np.random.default_rng(9)
    base = rng.integers(0, 200, size=(32, 48, 3), dtype=np.uint8)
    noisy = base.copy()
    # flip a few scattered pixels slightly
    for _ in range(20):
        y, x = rng.integers(0, 32), rng.integers(0, 48)
        noisy[y, x] = np.clip(noisy[y, x] + 5, 0, 255)
    got = _run(spark, [(1, base), (2, noisy)])
    ham = bin(got[1][0] ^ got[2][0]).count("1")
    assert ham <= 6   # low-frequency projection shrugs off the noise


def test_alignment_guard(spark):
    a = np.zeros((30, 48, 3), dtype=np.uint8)
    with pytest.raises(Exception, match="multiple of 8"):
        _run(spark, [(1, a)])


def test_synth_twin_parity(spark):
    media = multimodal.synthetic_raw_rgb_media(spark, n=8, w=48, h=32)
    got = {
        r.media_id: (r.phash, r.median_coef)
        for r in multimodal.image_phash(media).collect()
    }
    out = duckdb.connect().execute(
        multimodal.image_phash_sql(8, w=48, h=32)
    ).fetchall()
    assert {r[0]: (r[1], r[2]) for r in out} == got

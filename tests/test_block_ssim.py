"""Block SSIM (multimodal.video_block_ssim) — static blocks score an
exact 10⁶, anti-correlated blocks go negative, luminance-shift and
contrast cases match a Fraction mirror, cut-video semantics, twin
parity on the synth."""

from fractions import Fraction

import duckdb
import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ssim-tests", master="local[4]",
                    shuffle_partitions=8)


C1, C2 = multimodal.SSIM_C1_Q, multimodal.SSIM_C2_Q


def _media_from_frames(spark, mid, frames):
    # frames: list of (h, w, 3) uint8 arrays
    payload = np.concatenate(
        [f.reshape(-1) for f in frames]
    ).astype(np.uint8).tobytes()
    h, w, _ = frames[0].shape
    rows = [(mid, f"media://ssim/{mid}", "video", payload,
             w, h, 0, "rgb24/rawvideo")]
    return spark.createDataFrame(
        rows,
        "media_id long, url string, media_type string, "
        "payload binary, meta_width int, meta_height int, "
        "meta_duration_ms long, meta_codec string",
    )


def _run(spark, frames, block=4, mid=0):
    out = multimodal.video_block_ssim(
        _media_from_frames(spark, mid, frames), block=block
    ).collect()
    return {(r.pair_idx, r.yb, r.xb): r.ssim_ppm for r in out}


def _ssim_ppm(a, b):
    # Fraction replay of the cleared formula on two luma blocks
    a = [int(v) for v in np.asarray(a).reshape(-1)]
    b = [int(v) for v in np.asarray(b).reshape(-1)]
    n = len(a)
    s1, s2 = sum(a), sum(b)
    q1 = sum(v * v for v in a)
    q2 = sum(v * v for v in b)
    p = sum(x * y for x, y in zip(a, b))
    num = (2 * s1 * s2 + C1 * n * n) * (
        2 * (n * p - s1 * s2) + C2 * n * n)
    den = (s1 * s1 + s2 * s2 + C1 * n * n) * (
        (n * q1 - s1 * s1) + (n * q2 - s2 * s2) + C2 * n * n)
    scaled = num * 1_000_000
    return -((-scaled) // den) if scaled < 0 else scaled // den


def _rgb(luma_third):
    # build an rgb frame whose channel-sum luma is 3× the given grid
    g = np.asarray(luma_third, dtype=np.uint8)
    return np.stack([g, g, g], axis=2)


def test_static_pair_scores_exactly_one(spark):
    rng = np.random.default_rng(1)
    f = _rgb(rng.integers(0, 255, size=(4, 8)))
    got = _run(spark, [f, f.copy()])
    assert set(got.values()) == {1_000_000}


def test_anticorrelated_goes_negative(spark):
    a = np.zeros((4, 4), dtype=np.uint8)
    a[::2, :] = 200
    b = 200 - a
    got = _run(spark, [_rgb(a), _rgb(b)])
    assert all(v < 0 for v in got.values())


def test_matches_fraction_mirror(spark):
    rng = np.random.default_rng(7)
    fa = rng.integers(0, 255, size=(4, 8, 3)).astype(np.uint8)
    fb = rng.integers(0, 255, size=(4, 8, 3)).astype(np.uint8)
    got = _run(spark, [fa, fb])
    ga = fa.sum(axis=2, dtype=np.int64)
    gb = fb.sum(axis=2, dtype=np.int64)
    for (pi, yb, xb), v in got.items():
        assert pi == 0
        assert v == _ssim_ppm(
            ga[yb * 4:(yb + 1) * 4, xb * 4:(xb + 1) * 4],
            gb[yb * 4:(yb + 1) * 4, xb * 4:(xb + 1) * 4],
        )


def test_cut_video_semantics(spark):
    # within a scene only pixel-row 0 animates → all blocks with
    # yb > 0 score exactly 10⁶ off-cut; at the cut they drop
    media = multimodal.synthetic_cut_video_media(
        spark, n=2, w=16, h=12, n_frames=16, scene_len=8
    )
    out = multimodal.video_block_ssim(media, block=4).collect()
    body = [r for r in out if r.yb > 0]
    off_cut = [r for r in body if r.pair_idx != 7]
    at_cut = [r for r in body if r.pair_idx == 7]
    assert all(r.ssim_ppm == 1_000_000 for r in off_cut)
    assert all(r.ssim_ppm < 1_000_000 for r in at_cut)


def test_block_guard(spark):
    f = _rgb(np.zeros((5, 8)))
    with pytest.raises(Exception, match="not a"):
        _run(spark, [f, f], block=4)
    with pytest.raises(ValueError, match="block must"):
        multimodal.video_block_ssim(None, block=1)


def test_twin_parity_on_synth(spark):
    media = multimodal.synthetic_cut_video_media(
        spark, n=4, w=16, h=12, n_frames=24, scene_len=8
    )
    got = {
        (r.media_id, r.pair_idx, r.yb, r.xb): r.ssim_ppm
        for r in multimodal.video_block_ssim(media, block=4).collect()
    }
    out = duckdb.connect().execute(multimodal.video_block_ssim_sql(
        4, w=16, h=12, n_frames=24, scene_len=8, block=4
    )).fetchall()
    assert {(r[0], r[1], r[2], r[3]): r[4] for r in out} == got

"""Multimodal binary-column path: raw-RGB decode + bilinear resize
(real pixel math) and the Spark plumbing around it."""

import numpy as np
import pytest

from openstreetmap_license_change_spark.operators.multimodal import (
    _decode_rgb,
    _resize_bilinear,
)


# -- pure numpy properties (no Spark) -----------------------------------------

def test_decode_pads_and_trims():
    img = _decode_rgb(b"\x01\x02\x03", 2, 2)  # 12 bytes needed
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [1, 2, 3] and img[1, 1].tolist() == [0, 0, 0]
    big = _decode_rgb(bytes(range(24)), 2, 2)  # 24 > 12: trimmed
    assert big.shape == (2, 2, 3) and big[1, 1].tolist() == [9, 10, 11]


def test_resize_constant_image_stays_constant():
    img = np.full((17, 13, 3), 200, dtype=np.uint8)
    out = _resize_bilinear(img, 5, 7)
    assert out.shape == (7, 5, 3)
    assert (out == 200).all()


def test_resize_preserves_linear_ramp_interior():
    # bilinear interpolation reproduces linear functions exactly;
    # integer-factor downscale of a ramp must stay a ramp (interior)
    w, h = 64, 64
    x = np.arange(w, dtype=np.float64)[None, :]
    img = np.repeat(x * 2, h, axis=0).astype(np.uint8)
    img3 = np.stack([img] * 3, axis=2)
    out = _resize_bilinear(img3, 32, 32).astype(np.int64)
    diffs = np.diff(out[16, 4:28, 0])
    assert (np.abs(diffs - 4) <= 1).all()  # slope 2 * factor 2, +-rounding


def test_resize_identity():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    out = _resize_bilinear(img, 11, 9)
    assert (out == img).all()


# -- Spark end-to-end ----------------------------------------------------------

@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pytest-multimodal", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_resize_images_end_to_end(spark):
    from openstreetmap_license_change_spark.operators import multimodal as mm

    media = mm.synthetic_raw_rgb_media(spark, n=6, w=48, h=32)
    out = mm.resize_images(media, out_w=16, out_h=16)
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == set(range(6))
    for mid, r in rows.items():
        assert r.width == 16 and r.height == 16
        assert len(r.payload) == 16 * 16 * 3
        # oracle: run the same numpy math locally on the same synthetic image
        x = np.arange(48)[None, :, None]
        y = np.arange(32)[:, None, None]
        c = np.arange(3)[None, None, :]
        img = ((x * 3 + y * 7 + c * 11 + mid * 13) % 256).astype(np.uint8)
        expect = mm._resize_bilinear(img, 16, 16)
        got = np.frombuffer(r.payload, dtype=np.uint8).reshape(16, 16, 3)
        assert (got == expect).all()
        assert abs(r.mean_r - expect[:, :, 0].mean()) < 1e-4


def test_metadata_only_query_prunes_payload(spark):
    """Column pruning: a metadata-only aggregate over the media table
    must not read the payload column."""
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, 50)
    q = media.groupBy("media_type").agg(F.avg("meta_width").alias("w"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_audio_features_known_clip(spark):
    """Decode math on a hand-built PCM16-LE clip: [100, -50, 25, 0, -75]
    → sum_abs 250, sum_sq 19_350, two sign flips (100→-50, -50→25; 0
    never flips)."""
    import struct

    from openstreetmap_license_change_spark.operators import multimodal

    payload = struct.pack("<5h", 100, -50, 25, 0, -75)
    media = spark.createDataFrame(
        [(7, "media://a/7", "audio", bytearray(payload), 0, 0, 1, "pcm")],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.audio_features(media).collect()[0]
    assert (row.media_id, row.n_samples, row.sum_abs, row.sum_sq,
            row.zero_crossings) == (7, 5, 250, 100*100 + 50*50 + 25*25 + 75*75, 2)


def test_audio_features_empty_payload(spark):
    from openstreetmap_license_change_spark.operators import multimodal

    media = spark.createDataFrame(
        [(1, "u", "audio", bytearray(b""), 0, 0, 0, "pcm")],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.audio_features(media).collect()[0]
    assert (row.n_samples, row.sum_abs, row.sum_sq, row.zero_crossings) == (
        0, 0, 0, 0)


def test_sampled_frame_stats_slices_correct_frame(spark):
    """Frame slicing: a 2-frame clip where frame 1 is all-255 and frame
    0 all-0; sampling both frames must attribute the sums to the right
    indices (an offset bug would swap or blend them)."""
    import numpy as np

    from openstreetmap_license_change_spark.operators import multimodal

    w, h = 4, 2
    f0 = np.zeros((h, w, 3), dtype=np.uint8)
    f1 = np.full((h, w, 3), 255, dtype=np.uint8)
    payload = f0.tobytes() + f1.tobytes()
    # fps=8 → frame 1 is at 125 ms; duration 250 ms
    media = spark.createDataFrame(
        [(3, "media://v/3", "video", bytearray(payload), w, h, 250, "raw")],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r.frame_idx: (r.sum_r, r.sum_g, r.sum_b)
        for r in multimodal.sampled_frame_stats(media, every_ms=125).collect()
    }
    assert rows[0] == (0, 0, 0)
    assert rows[1] == (255 * w * h, 255 * w * h, 255 * w * h)

"""Integral-image local contrast (multimodal.image_box_contrast) —
flat-image zero plant, direct-convolution numpy mirror, twin parity,
small-image skip, radius guard."""

import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("boxcontrast-tests", master="local[4]",
                    shuffle_partitions=8)


def _media_df(spark, imgs):
    """imgs: {media_id: HxWx3 uint8 array}"""
    rows = [
        (int(mid), "image", bytearray(a.tobytes()),
         int(a.shape[1]), int(a.shape[0]))
        for mid, a in imgs.items()
    ]
    return spark.createDataFrame(
        rows,
        "media_id bigint, media_type string, payload binary, "
        "meta_width int, meta_height int",
    )


def _mirror(a, r, thr):
    g = a.sum(axis=2).astype(np.int64)
    h, w = g.shape
    area = (2 * r + 1) ** 2
    out = []
    for y in range(r, h - r):
        for x in range(r, w - r):
            box = int(g[y - r: y + r + 1, x - r: x + r + 1].sum())
            out.append(abs(area * int(g[y, x]) - box))
    out = np.array(out, dtype=np.int64)
    return (
        int(out.size), int(out.sum()), int(out.max()),
        int((out <= thr * area).sum()),
    )


def test_uniform_image_all_flat(spark):
    img = np.full((10, 12, 3), 77, dtype=np.uint8)
    df = _media_df(spark, {1: img})
    got = multimodal.image_box_contrast(df, radius=2).collect()[0]
    assert (got.n_interior, got.contrast_sum, got.contrast_max,
            got.n_flat) == (6 * 8, 0, 0, 6 * 8)


def test_single_bright_pixel(spark):
    """One hot pixel: its own contrast is A·Δ − Δ = (A−1)·Δ; window
    neighbors see Δ once in the box."""
    img = np.zeros((9, 9, 3), dtype=np.uint8)
    img[4, 4, :] = 100  # luma 300 at center
    df = _media_df(spark, {1: img})
    got = multimodal.image_box_contrast(
        df, radius=1, flat_threshold=0
    ).collect()[0]
    area = 9
    assert got.contrast_max == (area - 1) * 300
    # 9 windows contain the hot pixel: center (A−1)Δ + 8 neighbors Δ
    assert got.contrast_sum == (area - 1) * 300 + 8 * 300
    assert got.n_flat == got.n_interior - 9


def test_matches_direct_mirror(spark):
    rng = np.random.RandomState(47)
    imgs = {
        i: rng.randint(0, 256, size=(14, 17, 3), dtype=np.uint8)
        .astype(np.uint8)
        for i in range(4)
    }
    df = _media_df(spark, imgs)
    got = {
        r.media_id: (r.n_interior, r.contrast_sum, r.contrast_max,
                     r.n_flat)
        for r in multimodal.image_box_contrast(
            df, radius=3, flat_threshold=20
        ).collect()
    }
    want = {mid: _mirror(a, 3, 20) for mid, a in imgs.items()}
    assert got == want


def test_too_small_image_skipped(spark):
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    df = _media_df(spark, {1: img})
    assert multimodal.image_box_contrast(df, radius=2).count() == 0


def test_duckdb_twin_parity(spark):
    import duckdb

    # big enough that the mod-256 luma wraps land in the interior —
    # a smaller ramp is affine and box-mean-exact (contrast all 0)
    media = multimodal.synthetic_raw_rgb_media(spark, n=6, w=40, h=30)
    got = {
        r.media_id: (r.n_interior, r.contrast_sum, r.contrast_max,
                     r.n_flat)
        for r in multimodal.image_box_contrast(media, radius=2)
        .collect()
    }
    rows = duckdb.sql(
        multimodal.image_box_contrast_sql(6, 40, 30, radius=2)
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in rows} == got
    assert any(v[1] > 0 for v in got.values())


def test_radius_guard(spark):
    with pytest.raises(ValueError, match="radius"):
        multimodal.image_box_contrast_sql(1, 10, 10, radius=8)

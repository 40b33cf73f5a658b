"""Exact image moments (multimodal.image_moments) — degenerate-line
eccentricity closed forms, orientation sectors, iso/degenerate
conventions, loud size guard, synthetic corpus ≡ int mirror ≡ DuckDB
pixel-replay twin."""

import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("moments-tests", master="local[4]",
                    shuffle_partitions=8)


def _media_df(spark, imgs):
    """imgs: list of (media_id, np.uint8 array h×w×3)."""
    rows = [
        (int(mid), f"media://{mid}", "image", bytearray(a.tobytes()),
         int(a.shape[1]), int(a.shape[0]), 0, "rgb24/raw")
        for mid, a in imgs
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, url string, media_type string, "
        "payload binary, meta_width int, meta_height int, "
        "meta_duration_ms int, meta_codec string",
    )


def _run(spark, imgs):
    out = multimodal.image_moments(_media_df(spark, imgs)).collect()
    return {
        r.media_id: (r.m00, r.cx_micro, r.cy_micro, r.mu20_c,
                     r.mu11_c, r.mu02_c, r.ecc_ppm, r.theta2_sector)
        for r in out
    }


def _mirror(imgs):
    out = {}
    for mid, a in imgs:
        h, w, _ = a.shape
        gray = a.astype(int).sum(axis=2)
        m00 = m10 = m01 = m20 = m02 = m11 = 0
        for y in range(h):
            for x in range(w):
                g = int(gray[y, x])
                m00 += g
                m10 += x * g
                m01 += y * g
                m20 += x * x * g
                m02 += y * y * g
                m11 += x * y * g
        if m00 == 0:
            continue
        mu20 = m00 * m20 - m10 * m10
        mu11 = m00 * m11 - m10 * m01
        mu02 = m00 * m02 - m01 * m01
        av, bv = 2 * mu11, mu20 - mu02
        tr = mu20 + mu02
        ecc = ((bv * bv + av * av) * 10**6) // (tr * tr) \
            if tr > 0 else None
        if av == 0 and bv == 0:
            sect = "iso"
        elif abs(bv) > abs(av):
            sect = "E" if bv > 0 else "W"
        elif abs(av) > abs(bv):
            sect = "N" if av > 0 else "S"
        else:
            sect = ("N" if av > 0 else "S") + \
                ("E" if bv > 0 else "W")
        out[mid] = (m00, (m10 * 10**6) // m00, (m01 * 10**6) // m00,
                    mu20, mu11, mu02, ecc, sect)
    return out


def _bar(w, h, kind):
    a = np.zeros((h, w, 3), dtype=np.uint8)
    if kind == "hbar":
        a[h // 2, :, :] = 100
    elif kind == "vbar":
        a[:, w // 2, :] = 100
    elif kind == "diag":
        for i in range(min(w, h)):
            a[i, i, :] = 100
    elif kind == "flat":
        a[:, :, :] = 50
    return a


def test_degenerate_lines(spark):
    imgs = [(1, _bar(8, 8, "hbar")), (2, _bar(8, 8, "vbar")),
            (3, _bar(8, 8, "diag"))]
    got = _run(spark, imgs)
    assert got[1][7] == "E" and got[1][6] == 10**6   # horizontal
    assert got[2][7] == "W" and got[2][6] == 10**6   # vertical
    assert got[3][7] == "N" and got[3][6] == 10**6   # y=x diagonal
    assert got == _mirror(imgs)


def test_flat_square_isotropic(spark):
    imgs = [(1, _bar(8, 8, "flat"))]
    got = _run(spark, imgs)
    m00, cx, cy, mu20, mu11, mu02, ecc, sect = got[1]
    assert sect == "iso" and ecc == 0 and mu20 == mu02 and mu11 == 0
    assert cx == cy == 3_500_000   # centroid at (3.5, 3.5)
    assert got == _mirror(imgs)


def test_single_pixel_and_zero_image(spark):
    one = np.zeros((4, 4, 3), dtype=np.uint8)
    one[2, 1, 0] = 9
    imgs = [(1, one), (2, np.zeros((4, 4, 3), dtype=np.uint8))]
    got = _run(spark, imgs)
    assert set(got) == {1}            # all-zero image: no row
    assert got[1][6] is None          # point mass: ecc undefined
    assert got[1][7] == "iso"
    assert got[1][1:3] == (10**6, 2 * 10**6)
    assert got == _mirror(imgs)


def test_size_guard(spark):
    big = np.ones((64, 64, 3), dtype=np.uint8)   # 64·64·64 > 1e5
    with pytest.raises(Exception, match="image_moments"):
        _run(spark, [(1, big)])


def test_synthetic_vs_mirror_and_twin(spark):
    import duckdb

    n, w, h = 12, 48, 32
    media = multimodal.synthetic_raw_rgb_media(spark, n=n, w=w, h=h)
    out = multimodal.image_moments(media).collect()
    got = {
        r.media_id: (r.m00, r.cx_micro, r.cy_micro, r.mu20_c,
                     r.mu11_c, r.mu02_c, r.ecc_ppm, r.theta2_sector)
        for r in out
    }
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    imgs = [
        (mid, ((x * 3 + y * 7 + c * 11 + mid * 13) % 256)
         .astype(np.uint8))
        for mid in range(n)
    ]
    assert got == _mirror(imgs)
    twin = duckdb.sql(multimodal.image_moments_sql(n, w, h)).fetchall()
    assert {r[0]: tuple(r[1:]) for r in twin} == got

"""ViT patch extraction (multimodal.image_patches) — exact per-patch
channel sums vs a per-pixel Python mirror, edge-patch true extents,
full-coverage invariant, and the degenerate patch size."""

import pytest

from openstreetmap_license_change_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("patch-tests", master="local[4]",
                    shuffle_partitions=8)


W_, H_ = 48, 32


def _pixel(mid, x, y, c):
    return (x * 3 + y * 7 + c * 11 + mid * 13) % 256


def _python(n_imgs, patch, w=W_, h=H_):
    out = {}
    for mid in range(n_imgs):
        prows = (h + patch - 1) // patch
        pcols = (w + patch - 1) // patch
        for r in range(prows):
            for c in range(pcols):
                xs = range(c * patch, min((c + 1) * patch, w))
                ys = range(r * patch, min((r + 1) * patch, h))
                sums = [0, 0, 0]
                n = 0
                for y in ys:
                    for x in xs:
                        n += 1
                        for ch in range(3):
                            sums[ch] += _pixel(mid, x, y, ch)
                out[(mid, r, c)] = (n, *sums)
    return out


def _spark(spark, n_imgs, patch):
    media = mm.synthetic_raw_rgb_media(spark, n=n_imgs, w=W_, h=H_)
    rows = mm.image_patches(media, patch=patch).collect()
    return {
        (r["media_id"], r["patch_row"], r["patch_col"]):
            (r["n_px"], r["sum_r"], r["sum_g"], r["sum_b"])
        for r in rows
    }


def test_exact_patch_sums(spark):
    got = _spark(spark, 2, patch=16)
    assert got == _python(2, 16)
    # 48×32 at 16 → 2 rows × 3 cols per image, all full patches
    assert len(got) == 2 * 2 * 3
    assert all(v[0] == 256 for v in got.values())


def test_edge_patches_true_extent(spark):
    """patch=20 over 48×32: edge columns are 8 wide, edge rows 12
    tall; coverage still sums to every pixel exactly once."""
    got = _spark(spark, 1, patch=20)
    assert got == _python(1, 20)
    assert got[(0, 0, 2)][0] == 20 * 8      # right edge
    assert got[(0, 1, 0)][0] == 12 * 20     # bottom edge
    assert got[(0, 1, 2)][0] == 12 * 8      # corner
    assert sum(v[0] for v in got.values()) == W_ * H_


def test_patch_one_is_pixels(spark):
    got = _spark(spark, 1, patch=W_ * 2)  # one giant patch
    assert got[(0, 0, 0)][0] == W_ * H_


def test_validation(spark):
    media = mm.synthetic_raw_rgb_media(spark, n=1, w=W_, h=H_)
    with pytest.raises(ValueError, match="patch"):
        mm.image_patches(media, patch=0)

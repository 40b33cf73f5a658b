"""Per-frame zero-crossing rate (multimodal.audio_zcr_frames) and
exact Sobel gradient statistics (multimodal.image_gradients) —
hand-computed kernels, structural regime separation on the synthetic
media, numpy/Python mirrors, DuckDB twins replaying every sample and
pixel."""

import numpy as np
import pytest
import duckdb

from openstreetmap_license_change_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("zcrsobel-tests", master="local[4]",
                    shuffle_partitions=8)


def _pcm_media(spark, clips):
    """Build a media DF from explicit int16 sample lists."""
    import pandas as pd
    from typing import Iterator

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                x = np.asarray(clips[int(mid)], dtype="<i2")
                recs.append(
                    (int(mid), f"media://t/{mid}", "audio", x.tobytes(),
                     0, 0, 0, "pcm_s16le/raw")
                )
            yield pd.DataFrame(recs, columns=[
                "media_id", "url", "media_type", "payload",
                "meta_width", "meta_height", "meta_duration_ms",
                "meta_codec",
            ])

    return spark.range(0, len(clips)).mapInPandas(
        gen, schema=mm.MEDIA_SCHEMA
    )


def test_zcr_hand_case(spark):
    clips = [
        [1, -1, 2, -2, 3],      # 4 crossings in one frame
        [1, 0, -1, 5, 5, -5],   # zeros never cross: 1*0, 0*-1 no; -1*5 yes; 5*-5 yes
    ]
    media = _pcm_media(spark, clips)
    got = {
        (r.media_id, r.frame_idx): (r.n_samples, r.n_zc, r.peak)
        for r in mm.audio_zcr_frames(media, frame_samples=8).collect()
    }
    assert got[(0, 0)] == (5, 4, 3)
    assert got[(1, 0)] == (6, 2, 5)


def test_zcr_frame_local_boundaries(spark):
    # sign flip exactly at the frame boundary must NOT count
    clips = [[5, 5, -5, -5]]
    media = _pcm_media(spark, clips)
    got = {
        r.frame_idx: r.n_zc
        for r in mm.audio_zcr_frames(media, frame_samples=2).collect()
    }
    assert got == {0: 0, 1: 0}


def test_zcr_regime_separation(spark):
    """Quiet period-7 sawtooth bursts vs the loud ~286-sample-period
    ramp: ZCR separates the regimes structurally on the gated synth
    (the quiet frames cross ~18× more often)."""
    media = mm.synthetic_gated_pcm_media(spark, n=4, n_samples=2048,
                                         burst=256)
    rows = mm.audio_zcr_frames(media, frame_samples=256).collect()
    quiet = [r.n_zc for r in rows
             if (r.frame_idx + r.media_id) % 3 == 1]
    loud = [r.n_zc for r in rows
            if (r.frame_idx + r.media_id) % 3 != 1]
    assert min(quiet) > 4 * max(loud)


def test_zcr_validation(spark):
    media = mm.synthetic_gated_pcm_media(spark, n=1)
    with pytest.raises(ValueError):
        mm.audio_zcr_frames(media, frame_samples=0)


def test_zcr_twin(spark):
    media = mm.synthetic_gated_pcm_media(spark, n=8, n_samples=2048,
                                         burst=256)
    got = sorted(
        tuple(r) for r in
        mm.audio_zcr_frames(media, frame_samples=256).collect()
    )
    con = duckdb.connect()
    twin = sorted(tuple(r) for r in
                  con.execute(mm.audio_zcr_sql(8)).fetchall())
    assert got == twin


# ----------------------------------------------------------------- sobel
def _np_sobel(img, thr=512):
    g = img.sum(axis=2).astype(np.int64)
    h, w = g.shape
    mags = []
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            gx = (
                g[y-1, x+1] + 2*g[y, x+1] + g[y+1, x+1]
                - g[y-1, x-1] - 2*g[y, x-1] - g[y+1, x-1]
            )
            gy = (
                g[y+1, x-1] + 2*g[y+1, x] + g[y+1, x+1]
                - g[y-1, x-1] - 2*g[y-1, x] - g[y-1, x+1]
            )
            mags.append(abs(gx) + abs(gy))
    mags = np.array(mags)
    return (len(mags), int(mags.sum()), int(mags.max()),
            int((mags >= thr).sum()))


def test_sobel_matches_scalar_mirror(spark):
    media = mm.synthetic_raw_rgb_media(spark, n=3, w=12, h=9)
    got = {
        r.media_id: (r.n_interior, r.grad_l1, r.grad_max, r.n_edges)
        for r in mm.image_gradients(media).collect()
    }
    for mid in range(3):
        x = np.arange(12)[None, :, None]
        y = np.arange(9)[:, None, None]
        c = np.arange(3)[None, None, :]
        img = ((x * 3 + y * 7 + c * 11 + mid * 13) % 256).astype(np.uint8)
        assert got[mid] == _np_sobel(img)


def test_sobel_flat_image_zero(spark):
    """A constant image has zero gradient everywhere — the blank-frame
    case the quality gate exists for."""
    import pandas as pd
    from typing import Iterator

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                img = np.full((8, 8, 3), 77, dtype=np.uint8)
                recs.append((int(mid), f"m://{mid}", "image",
                             img.tobytes(), 8, 8, 0, "rgb24/raw"))
            yield pd.DataFrame(recs, columns=[
                "media_id", "url", "media_type", "payload",
                "meta_width", "meta_height", "meta_duration_ms",
                "meta_codec"])

    media = spark.range(0, 1).mapInPandas(gen, schema=mm.MEDIA_SCHEMA)
    r = mm.image_gradients(media).collect()[0]
    assert (r.grad_l1, r.grad_max, r.n_edges) == (0, 0, 0)
    assert r.n_interior == 36


def test_sobel_planted_edge(spark):
    """A vertical step edge: |gx| = 4·step on the edge columns, gy = 0."""
    import pandas as pd
    from typing import Iterator

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                img = np.zeros((5, 6, 3), dtype=np.uint8)
                img[:, 3:, :] = 50  # luma step of 150 at x=3
                recs.append((int(mid), f"m://{mid}", "image",
                             img.tobytes(), 6, 5, 0, "rgb24/raw"))
            yield pd.DataFrame(recs, columns=[
                "media_id", "url", "media_type", "payload",
                "meta_width", "meta_height", "meta_duration_ms",
                "meta_codec"])

    media = spark.range(0, 1).mapInPandas(gen, schema=mm.MEDIA_SCHEMA)
    r = mm.image_gradients(media, edge_threshold=600).collect()[0]
    assert r.grad_max == 4 * 150
    # edge magnitude 600 at interior x∈{2,3} across 3 interior rows
    assert r.n_edges == 6


def test_sobel_twin(spark):
    media = mm.synthetic_raw_rgb_media(spark, n=8, w=48, h=32)
    got = sorted(tuple(r) for r in mm.image_gradients(media).collect())
    con = duckdb.connect()
    twin = sorted(tuple(r) for r in
                  con.execute(mm.image_gradients_sql(8, 48, 32)).fetchall())
    assert got == twin

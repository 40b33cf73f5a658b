"""Video shot-boundary detection (multimodal.video_frame_dhash +
video_shot_segments) — planted hard cuts at known frame indices, a
plain-Python per-pixel mirror of the frame dHash, threshold edge
cases, and segmentation semantics."""

import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("video-shot-tests", master="local[4]",
                    shuffle_partitions=8)


W_, H_, NF, SCENE = 16, 12, 24, 8


def _pixel(mid, f, x, y, c, scene_len=SCENE):
    if y == 0:
        return (x * 3 + c * 11 + mid * 13 + f * 29) % 256
    return (x * 3 + y * 7 + c * 11 + mid * 13
            + (f // scene_len) * 41 * x) % 256


def _python_frame_dhash(mid, f, w=W_, h=H_):
    gw, gh = mm.DHASH_GRID_W, mm.DHASH_GRID_H
    sums = [[0] * gw for _ in range(gh)]
    cnts = [[0] * gw for _ in range(gh)]
    for y in range(h):
        for x in range(w):
            gray = sum(_pixel(mid, f, x, y, c) for c in range(3))
            xb, yb = (x * gw) // w, (y * gh) // h
            sums[yb][xb] += gray
            cnts[yb][xb] += 1
    hv = 0
    for r in range(gh):
        for c in range(gw - 1):
            if sums[r][c] * cnts[r][c + 1] > sums[r][c + 1] * cnts[r][c]:
                hv |= 1 << (r * (gw - 1) + c)
    return hv


def test_frame_dhash_matches_python_mirror(spark):
    media = mm.synthetic_cut_video_media(spark, n=2)
    got = {
        (r["media_id"], r["frame_idx"]): r["fhash"]
        for r in mm.video_frame_dhash(media).collect()
    }
    assert len(got) == 2 * NF
    for mid in range(2):
        for f in (0, 1, 7, 8, 15, 16, 23):
            assert got[(mid, f)] == _python_frame_dhash(mid, f)


def test_cuts_detected_at_scene_boundaries(spark):
    """24 frames, scene length 8 → shots exactly [0,7], [8,15],
    [16,23] for every clip at the default threshold."""
    media = mm.synthetic_cut_video_media(spark, n=4)
    hashes = mm.video_frame_dhash(media)
    shots = mm.video_shot_segments(hashes, threshold=10).collect()
    by_clip = {}
    for r in shots:
        by_clip.setdefault(r["media_id"], []).append(
            (r["shot_id"], r["start_frame"], r["end_frame"], r["n_frames"])
        )
    for mid, segs in by_clip.items():
        assert sorted(segs) == [
            (1, 0, 7, 8), (2, 8, 15, 8), (3, 16, 23, 8)
        ], f"clip {mid}: {sorted(segs)}"


def test_threshold_extremes(spark):
    """Threshold ≥ 56 → one shot per clip; threshold −1 → every frame
    its own shot (hamming 0 still exceeds −1)."""
    media = mm.synthetic_cut_video_media(spark, n=2)
    hashes = mm.video_frame_dhash(media).localCheckpoint(eager=True)
    one = mm.video_shot_segments(hashes, threshold=56).collect()
    assert sorted(
        (r["media_id"], r["shot_id"], r["n_frames"]) for r in one
    ) == [(0, 1, NF), (1, 1, NF)]
    assert all(r["start_frame"] == 0 and r["end_frame"] == NF - 1
               for r in one)
    per_frame = mm.video_shot_segments(hashes, threshold=-1).collect()
    assert len(per_frame) == 2 * NF
    assert all(r["n_frames"] == 1 for r in per_frame)


def test_max_step_hamming_excludes_opening_cut(spark):
    """The boundary's own distance belongs to the cut, not the shot it
    opens: a single-frame shot reports max_step_hamming 0."""
    media = mm.synthetic_cut_video_media(spark, n=1)
    hashes = mm.video_frame_dhash(media)
    rows = mm.video_shot_segments(hashes, threshold=-1).collect()
    assert all(r["max_step_hamming"] == 0 for r in rows)


def test_intra_scene_steps_below_cut_steps(spark):
    """Sanity on the synthetic design: within-scene hamming steps are
    strictly smaller than the cut steps that the threshold separates."""
    media = mm.synthetic_cut_video_media(spark, n=3)
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    hashes = mm.video_frame_dhash(media)
    w = W.partitionBy("media_id").orderBy("frame_idx")
    steps = hashes.select(
        "media_id", "frame_idx",
        F.bit_count(
            F.col("fhash").bitwiseXOR(F.lag("fhash").over(w))
        ).alias("ham"),
    ).where(F.col("ham").isNotNull()).collect()
    intra = [r["ham"] for r in steps if r["frame_idx"] % SCENE != 0]
    cuts = [r["ham"] for r in steps if r["frame_idx"] % SCENE == 0]
    assert max(intra) <= 10 < min(cuts)

"""Audio silence segmentation (multimodal.audio_frame_energy +
audio_silence_segments) — planted quiet bursts at known frame ranges,
a plain-Python mirror of the closed-form samples, tail-frame
semantics, and threshold edge cases."""

import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("audio-silence-tests", master="local[4]",
                    shuffle_partitions=8)


NS, BURST, FRAME = 2048, 256, 256


def _sample(mid, i):
    if (i // BURST + mid) % 3 == 1:
        return (i * 3) % 21 - 10
    return (i * 7 + mid * 13) % 2001 - 1000


def _python_segments(mid, n=NS, frame=FRAME, thr_amp=100):
    frames = []
    for f in range((n + frame - 1) // frame):
        sq = [
            _sample(mid, i) ** 2 for i in range(f * frame,
                                                min((f + 1) * frame, n))
        ]
        frames.append((len(sq), sum(sq)))
    segs = []
    for f, (cnt, ssq) in enumerate(frames):
        silent = ssq < cnt * thr_amp * thr_amp
        if segs and segs[-1]["is_silent"] == silent:
            s = segs[-1]
            s["end_frame"] = f
            s["n_frames"] += 1
            s["n_samples"] += cnt
            s["sum_sq"] += ssq
        else:
            segs.append(dict(
                seg_id=len(segs) + 1, is_silent=silent, start_frame=f,
                end_frame=f, n_frames=1, n_samples=cnt, sum_sq=ssq,
            ))
    return segs


def _spark_segments(spark, n_clips=4, frame=FRAME, thr_amp=100):
    media = mm.synthetic_gated_pcm_media(spark, n=n_clips, n_samples=NS,
                                         burst=BURST)
    energy = mm.audio_frame_energy(media, frame_samples=frame)
    rows = mm.audio_silence_segments(energy, thr_amp=thr_amp).collect()
    out = {}
    for r in rows:
        out.setdefault(r["media_id"], []).append(
            dict(seg_id=r["seg_id"], is_silent=r["is_silent"],
                 start_frame=r["start_frame"], end_frame=r["end_frame"],
                 n_frames=r["n_frames"], n_samples=r["n_samples"],
                 sum_sq=r["sum_sq"])
        )
    for v in out.values():
        v.sort(key=lambda s: s["seg_id"])
    return out


def test_matches_python_mirror(spark):
    got = _spark_segments(spark, n_clips=4)
    for mid in range(4):
        assert got[mid] == _python_segments(mid), f"clip {mid}"


def test_planted_silence_positions(spark):
    """With frame == burst, clip 0's quiet bursts sit at frames
    ≡ 1 (mod 3); segments alternate loud/silent accordingly."""
    got = _spark_segments(spark, n_clips=1)[0]
    silent_frames = set()
    for s in got:
        if s["is_silent"]:
            silent_frames.update(
                range(s["start_frame"], s["end_frame"] + 1)
            )
    assert silent_frames == {f for f in range(NS // FRAME)
                             if f % 3 == 1}


def test_threshold_extremes(spark):
    """thr_amp beyond max amplitude → everything one silent segment;
    thr_amp 1 → quiet bursts stay 'loud' (their Σx² exceeds n·1)."""
    all_silent = _spark_segments(spark, n_clips=2, thr_amp=2000)
    for segs in all_silent.values():
        assert len(segs) == 1 and segs[0]["is_silent"]
    none_silent = _spark_segments(spark, n_clips=2, thr_amp=1)
    for segs in none_silent.values():
        assert len(segs) == 1 and not segs[0]["is_silent"]


def test_tail_frame_kept(spark):
    """A clip whose length is not a frame multiple keeps its short
    tail frame, judged by its true sample count."""
    media = mm.synthetic_gated_pcm_media(spark, n=1, n_samples=300,
                                         burst=BURST)
    energy = mm.audio_frame_energy(media, frame_samples=FRAME).collect()
    by_f = {r["frame_idx"]: r for r in energy}
    assert by_f[0]["n_samples"] == 256 and by_f[1]["n_samples"] == 44
    total = sum(r["n_samples"] for r in energy)
    assert total == 300


def test_frame_samples_guard(spark):
    media = mm.synthetic_gated_pcm_media(spark, n=1)
    with pytest.raises(ValueError, match="frame_samples"):
        mm.audio_frame_energy(media, frame_samples=0)

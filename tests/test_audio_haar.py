"""Haar band energies (multimodal.audio_haar_energy) — hand-computed
tiny frames, constant/alternating signals land in the right bands,
tail-drop convention, guards, synth ≡ recursive Python mirror ≡
closed-form twin."""

import duckdb
import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("haar-tests", master="local[4]",
                    shuffle_partitions=8)


def _media(spark, clips):
    rows = [
        (mid, f"media://t/{mid}", "audio",
         np.asarray(x, dtype="<i2").tobytes(), 0, 0, 0, "pcm")
        for mid, x in clips
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, url string, media_type string, "
        "payload binary, meta_width int, meta_height int, "
        "meta_duration_ms long, meta_codec string",
    )


def _run(spark, clips, fs=8, lv=2):
    out = multimodal.audio_haar_energy(
        _media(spark, clips), frame_samples=fs, levels=lv
    ).collect()
    return {(r.media_id, r.frame_idx, r.band): (r.n_coeffs, r.sum_sq)
            for r in out}


def _mirror(clips, fs=8, lv=2):
    # recursive pairwise ladder — the structurally different replay
    out = {}
    for mid, x in clips:
        x = list(x)
        nf = len(x) // fs
        for f in range(nf):
            a = x[f * fs:(f + 1) * fs]
            for band in range(1, lv + 1):
                d = [a[2 * j] - a[2 * j + 1] for j in range(len(a) // 2)]
                a = [a[2 * j] + a[2 * j + 1] for j in range(len(a) // 2)]
                out[(mid, f, band)] = (len(d), sum(v * v for v in d))
            out[(mid, f, 0)] = (len(a), sum(v * v for v in a))
    return out


def test_constant_signal_all_in_dc(spark):
    # constant 5: every detail is 0; band-0 approx = (4·5)² per coeff
    got = _run(spark, [(1, [5] * 8)], fs=8, lv=2)
    assert got[(1, 0, 1)] == (4, 0)
    assert got[(1, 0, 2)] == (2, 0)
    assert got[(1, 0, 0)] == (2, 2 * (20 ** 2))


def test_alternating_signal_all_in_band1(spark):
    # +7,−7 alternating: band 1 coeffs = 14 each; bands 2 and 0 = 0
    got = _run(spark, [(1, [7, -7] * 4)], fs=8, lv=2)
    assert got[(1, 0, 1)] == (4, 4 * 14 ** 2)
    assert got[(1, 0, 2)] == (2, 0)
    assert got[(1, 0, 0)] == (2, 0)


def test_block_wave_lands_in_band2(spark):
    # ++−− pattern: band1=0 (pairs equal), band2 carries it
    got = _run(spark, [(1, [3, 3, -3, -3] * 2)], fs=8, lv=2)
    assert got[(1, 0, 1)][1] == 0
    assert got[(1, 0, 2)] == (2, 2 * 12 ** 2)
    assert got[(1, 0, 0)][1] == 0


def test_tail_frame_dropped(spark):
    # 11 samples at fs=8 → exactly one frame; the 3-sample tail
    # contributes nothing (stated convention)
    got = _run(spark, [(1, list(range(11)))], fs=8, lv=2)
    assert {k[1] for k in got} == {0}


def test_guards(spark):
    with pytest.raises(ValueError, match="power of"):
        multimodal.audio_haar_energy(None, frame_samples=12)
    with pytest.raises(ValueError, match="levels"):
        multimodal.audio_haar_energy(None, frame_samples=8, levels=4)


def test_synth_vs_mirror_and_twin(spark):
    media = multimodal.synthetic_gated_pcm_media(
        spark, n=4, n_samples=1024, burst=128
    )
    got = {
        (r.media_id, r.frame_idx, r.band): (r.n_coeffs, r.sum_sq)
        for r in multimodal.audio_haar_energy(
            media, frame_samples=256, levels=3
        ).collect()
    }
    # mirror from the same closed form
    clips = []
    for mid in range(4):
        i = np.arange(1024, dtype=np.int64)
        loud = (i * 7 + mid * 13) % 2001 - 1000
        quiet = (i * 3) % 21 - 10
        clips.append(
            (mid, np.where((i // 128 + mid) % 3 == 1, quiet, loud))
        )
    assert got == _mirror(clips, fs=256, lv=3)
    out = duckdb.connect().execute(multimodal.audio_haar_sql(
        4, n_samples=1024, burst=128, frame_samples=256, levels=3
    )).fetchall()
    assert {(r[0], r[1], r[2]): (r[3], r[4]) for r in out} == got

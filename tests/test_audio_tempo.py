"""Tempo induction (multimodal.audio_tempo) — planted beat period
recovered, fundamental beats its harmonic, silence emits nothing,
validation, gated-synth corpus ≡ numpy mirror ≡ DuckDB twin."""

import numpy as np
import pytest

import duckdb

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("tempo-tests", master="local[4]",
                    shuffle_partitions=8)


def _pcm(samples):
    return np.asarray(samples, dtype="<i2").tobytes()


def _run(spark, clips, fs=64, lv=3, lags=(2, 8), shift=8):
    df = spark.createDataFrame(
        [(i, "audio", p) for i, p in enumerate(clips)],
        "media_id long, media_type string, payload binary",
    )
    out = multimodal.audio_tempo(
        df, frame_samples=fs, levels=lv,
        lag_min=lags[0], lag_max=lags[1], flux_shift=shift,
    ).collect()
    return {r.media_id: (r.period_frames, r.r_q, r.n_pairs)
            for r in out}


def _flux(x, fs, lv, shift):
    nf = len(x) // fs
    x = x[: nf * fs]
    energies = []
    for f in range(nf):
        fr = x[f * fs:(f + 1) * fs]
        bands = []
        for band in range(1, lv + 1):
            blk = 1 << band
            half = blk >> 1
            sign = np.where(np.arange(fs) % blk < half, 1, -1)
            c = (fr * sign).reshape(-1, blk).sum(axis=1)
            bands.append(int((c * c).sum()))
        energies.append(bands)
    return {
        t: sum(max(0, energies[t][b] - energies[t - 1][b])
               for b in range(lv)) >> shift
        for t in range(1, nf)
    }


def _mirror(clips, fs=64, lv=3, lags=(2, 8), shift=8):
    out = {}
    for mid, payload in enumerate(clips):
        x = np.frombuffer(payload, dtype="<i2").astype(np.int64)
        fq = _flux(x, fs, lv, shift)
        best = None
        for k in range(lags[0], lags[1] + 1):
            pairs = [(t, t + k) for t in fq if t + k in fq]
            if not pairs:
                continue
            r = sum(fq[a] * fq[b] for a, b in pairs)
            if r > 0 and (best is None or (-r, k) < (-best[1], best[0])):
                best = (k, r, len(pairs))
        if best is not None:
            out[mid] = best
    return out


def _beat_clip(period_frames, fs, n_frames, mid=0):
    quiet = [3, -3] * (fs // 2)
    loud = [800, -800] * (fs // 2)
    frames = []
    for f in range(n_frames):
        frames += loud if f % period_frames == 0 else quiet
    return _pcm(frames)


def test_planted_beat_period(spark):
    # a loud frame every 4 frames over 32 frames → period 4 wins,
    # and beats its harmonic 8 (more aligned pairs)
    clip = _beat_clip(4, 64, 32)
    got = _run(spark, [clip])
    assert got[0][0] == 4
    assert got == _mirror([clip])


def test_silence_emits_nothing(spark):
    clip = _pcm([5, -5] * (64 * 8 // 2))   # constant pattern, no flux
    got = _run(spark, [clip])
    assert got == {}
    assert _mirror([clip]) == {}


def test_validation(spark):
    df = spark.createDataFrame(
        [(0, "audio", _pcm([0] * 256))],
        "media_id long, media_type string, payload binary",
    )
    with pytest.raises(ValueError, match="lag_min"):
        multimodal.audio_tempo(df, lag_min=5, lag_max=5)
    with pytest.raises(ValueError, match="flux_shift"):
        multimodal.audio_tempo(df, flux_shift=50)


def test_synth_corpus_vs_mirror_and_twin(spark):
    n, n_samples, burst, fs = 10, 8192, 256, 256
    media = multimodal.synthetic_gated_pcm_media(
        spark, n=n, n_samples=n_samples, burst=burst
    )
    out = multimodal.audio_tempo(
        media, frame_samples=fs, levels=3,
        lag_min=2, lag_max=8, flux_shift=20,
    ).collect()
    got = {r.media_id: (r.period_frames, r.r_q, r.n_pairs)
           for r in out}
    # the gate pattern repeats every 3 bursts = 3 frames
    assert got and all(v[0] == 3 for v in got.values())

    clips = []
    for mid in range(n):
        i = np.arange(n_samples, dtype=np.int64)
        loud = (i * 7 + mid * 13) % 2001 - 1000
        quiet = (i * 3) % 21 - 10
        x = np.where((i // burst + mid) % 3 == 1, quiet, loud)
        clips.append(np.asarray(x, dtype="<i2").tobytes())
    assert got == _mirror(clips, fs=fs, lv=3, lags=(2, 8), shift=20)

    twin = duckdb.sql(multimodal.audio_tempo_sql(
        n, n_samples=n_samples, burst=burst, frame_samples=fs,
        levels=3, lag_min=2, lag_max=8, flux_shift=20,
    )).fetchall()
    assert {r[0]: (r[1], r[2], r[3]) for r in twin} == got

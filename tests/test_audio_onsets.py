"""Spectral-flux onsets (multimodal.audio_onsets) — onsets fire
exactly at quiet→loud burst boundaries, releases don't fire,
constant clips are silent, threshold bites, mirror ≡ twin parity on
the gated synth corpus."""

import numpy as np
import pytest

import duckdb

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("onset-tests", master="local[4]",
                    shuffle_partitions=8)


def _pcm(samples):
    return np.asarray(samples, dtype="<i2").tobytes()


def _run(spark, clips, fs=64, lv=3, thr=(3, 2)):
    df = spark.createDataFrame(
        [(i, "audio", p) for i, p in enumerate(clips)],
        "media_id long, media_type string, payload binary",
    )
    out = multimodal.audio_onsets(
        df, frame_samples=fs, levels=lv,
        thr_num=thr[0], thr_den=thr[1],
    ).collect()
    return sorted((r.media_id, r.frame_idx, r.flux) for r in out)


def _mirror(clips, fs=64, lv=3, thr=(3, 2)):
    out = []
    for mid, payload in enumerate(clips):
        x = np.frombuffer(payload, dtype="<i2").astype(np.int64)
        nf = len(x) // fs
        x = x[: nf * fs]
        energies = []  # per frame: list of band energies 1..lv
        for f in range(nf):
            fr = x[f * fs:(f + 1) * fs]
            bands = []
            for band in range(1, lv + 1):
                blk = 1 << band
                half = blk >> 1
                sign = np.where(np.arange(fs) % blk < half, 1, -1)
                prod = fr * sign
                c = prod.reshape(-1, blk).sum(axis=1)
                bands.append(int((c * c).sum()))
            energies.append(bands)
        flux = []
        for t in range(1, nf):
            fl = sum(
                max(0, energies[t][b] - energies[t - 1][b])
                for b in range(lv)
            )
            flux.append((t, fl))
        total = sum(f for _, f in flux)
        nfl = len(flux)
        for t, fl in flux:
            if fl > 0 and fl * nfl * thr[1] > thr[0] * total:
                out.append((mid, t, fl))
    return sorted(out)


def test_onset_at_burst_boundary_release_silent(spark):
    # frames: quiet, quiet, LOUD, LOUD, quiet — one onset at frame
    # 2 (the attack); the release at frame 4 must NOT fire
    fs = 64
    quiet = [3, -3] * (fs // 2)
    loud = [900, -900] * (fs // 2)
    clip = _pcm(quiet + quiet + loud + loud + quiet)
    got = _run(spark, [clip], fs=fs)
    assert [(m, t) for m, t, _ in got] == [(0, 2)]
    assert got == _mirror([clip], fs=fs)


def test_constant_clip_no_onsets(spark):
    fs = 64
    clip = _pcm(([5, -5] * (fs // 2)) * 6)
    assert _run(spark, [clip], fs=fs) == []


def test_threshold_bites(spark):
    # two attacks, one big one small: a high threshold keeps only
    # the big one, a zero threshold keeps both
    fs = 64
    q = [2, -2] * (fs // 2)
    small = [40, -40] * (fs // 2)
    big = [900, -900] * (fs // 2)
    clip = _pcm(q + small + small + big + big + q)
    strict = _run(spark, [clip], fs=fs, thr=(3, 1))
    loose = _run(spark, [clip], fs=fs, thr=(0, 1))
    assert [(t) for _, t, _ in strict] == [3]
    assert [t for _, t, _ in loose] == [1, 3]
    assert loose == _mirror([clip], fs=fs, thr=(0, 1))


def test_validation(spark):
    clip = _pcm([0] * 128)
    with pytest.raises(ValueError, match="thr"):
        _run(spark, [clip], thr=(3, 0))


def test_synth_corpus_vs_twin(spark):
    media = multimodal.synthetic_gated_pcm_media(
        spark, n=8, n_samples=1024, burst=128
    )
    out = multimodal.audio_onsets(
        media, frame_samples=128, levels=3
    ).collect()
    got = sorted((r.media_id, r.frame_idx, r.flux) for r in out)
    assert len(got) > 0
    con = duckdb.connect()
    twin = con.execute(multimodal.audio_onsets_sql(
        8, n_samples=1024, burst=128, frame_samples=128, levels=3
    )).fetchall()
    assert sorted(tuple(r) for r in twin) == got

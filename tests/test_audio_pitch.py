"""Per-frame autocorrelation pitch estimation
(multimodal.audio_pitch_frames): exact integer R(tau) with a
smallest-lag argmax tie-break, structural planted periods on the
square-wave synth, numpy mirror, DuckDB twin replaying every sample
through a frame-local lag self-join."""

import numpy as np
import pytest
import duckdb

from openstreetmap_license_change_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("pitch-tests", master="local[4]",
                    shuffle_partitions=8)


def _pcm_media(spark, clips):
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


def test_pitch_hand_case(spark):
    # period-4 square wave: R(tau) maximal (== r0 restricted-sum) at
    # tau=4 among lags 2..6 in a single 16-sample frame.
    clip = ([100, 100, -100, -100] * 4)
    media = _pcm_media(spark, [clip])
    rows = mm.audio_pitch_frames(
        media, frame_samples=16, min_lag=2, max_lag=6
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    x = np.asarray(clip, dtype=np.int64)
    assert r.n_samples == 16
    assert r.r0 == int(np.dot(x, x))
    assert r.best_lag == 4
    assert r.best_r == int(np.dot(x[:-4], x[4:]))


def test_pitch_smallest_lag_tiebreak(spark):
    # constant signal: every lag ties (all products positive equal
    # sums differ by length... actually R(tau) = (n-tau)*A^2 strictly
    # decreases, so min_lag wins) — then an all-zero clip ties at 0
    # across all lags and the SMALLEST lag must win.
    media = _pcm_media(spark, [[0] * 12])
    rows = mm.audio_pitch_frames(
        media, frame_samples=16, min_lag=3, max_lag=7
    ).collect()
    assert rows[0].best_lag == 3 and rows[0].best_r == 0


def test_pitch_short_frame_null(spark):
    # frame shorter than min_lag+1 has no valid lag -> NULLs.
    media = _pcm_media(spark, [[5, -5, 5]])
    rows = mm.audio_pitch_frames(
        media, frame_samples=16, min_lag=8, max_lag=16
    ).collect()
    assert rows[0].best_lag is None and rows[0].best_r is None
    assert rows[0].r0 == 75


def test_pitch_tail_frame_and_lag_clamp(spark):
    # 20 samples, frame=16 -> tail frame of 4 samples; with
    # min_lag=2, max_lag=10 the tail only evaluates tau in 2..3.
    clip = list(range(-10, 10))
    media = _pcm_media(spark, [clip])
    got = {r.frame_idx: r for r in mm.audio_pitch_frames(
        media, frame_samples=16, min_lag=2, max_lag=10
    ).collect()}
    x = np.asarray(clip, dtype=np.int64)
    tail = x[16:]
    best = max(
        ((tau, int(np.dot(tail[:-tau], tail[tau:])))
         for tau in (2, 3)),
        key=lambda t: (t[1], -t[0]),
    )
    assert got[1].n_samples == 4
    assert (got[1].best_lag, got[1].best_r) == best


def test_pitch_planted_period_structural(spark):
    # synth clips: period P = 16 + (id%5)*8; R peaks at tau = P among
    # 8..64 for every frame (full frames only; all frames full here).
    media = mm.synthetic_square_pcm_media(spark, n=8, n_samples=1024)
    rows = mm.audio_pitch_frames(
        media, frame_samples=256, min_lag=8, max_lag=64
    ).collect()
    assert len(rows) == 8 * 4
    for r in rows:
        assert r.best_lag == 16 + (r.media_id % 5) * 8


def test_pitch_invalid_lags(spark):
    media = mm.synthetic_square_pcm_media(spark, n=1)
    with pytest.raises(ValueError):
        mm.audio_pitch_frames(media, min_lag=0)
    with pytest.raises(ValueError):
        mm.audio_pitch_frames(media, min_lag=9, max_lag=8)


def test_pitch_duckdb_twin(spark):
    media = mm.synthetic_square_pcm_media(spark, n=8, n_samples=1024)
    got = sorted(
        (r.media_id, r.frame_idx, r.n_samples, r.r0, r.best_lag,
         r.best_r)
        for r in mm.audio_pitch_frames(
            media, frame_samples=256, min_lag=8, max_lag=64
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(
        mm.audio_pitch_sql(8, 1024, 256, 8, 64)
    ).fetchall()))
    assert got == want

"""Per-shot medoid keyframes (multimodal.video_keyframes) — planted
hash streams with closed-form medoids, tie-break, shot agreement with
video_shot_segments, the loud shot-size guard, and DuckDB twin
parity on the synthetic cut clips."""

import pytest

from openstreetmap_license_change_spark.operators import multimodal


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("keyframe-tests", master="local[4]",
                    shuffle_partitions=8)


def _fh(spark, rows):
    return spark.createDataFrame(
        rows, "media_id bigint, frame_idx int, fhash bigint"
    )


def _run(spark, rows, **kw):
    out = multimodal.video_keyframes(_fh(spark, rows), **kw).collect()
    return {
        (r.media_id, r.shot_id): (r.keyframe_idx, r.n_frames,
                                  r.sum_hamming)
        for r in out
    }


def test_medoid_closed_form(spark):
    """Hashes {0b0, 0b1, 0b11} in one shot: pair-sum distances are
    (3, 2, 3) → the middle frame is the medoid."""
    rows = [(1, 0, 0b0), (1, 1, 0b1), (1, 2, 0b11)]
    got = _run(spark, rows, threshold=10)
    assert got[(1, 1)] == (1, 3, 2)


def test_tie_breaks_to_lowest_frame(spark):
    rows = [(1, 0, 0b0), (1, 1, 0b11)]
    got = _run(spark, rows, threshold=10)
    assert got[(1, 1)] == (0, 2, 2)


def test_shots_agree_with_shot_segments(spark):
    """Keyframe rows must land one-per-shot with the same (shot,
    n_frames) as video_shot_segments — shared helper, asserted."""
    rows = [(1, i, 0b1 if i < 4 else 0xFFF) for i in range(8)] + [
        (2, i, i % 2) for i in range(5)
    ]
    fh = _fh(spark, rows)
    key = _run(spark, rows, threshold=3)
    shots = {
        (r.media_id, r.shot_id): r.n_frames
        for r in multimodal.video_shot_segments(
            fh, threshold=3
        ).collect()
    }
    assert set(key) == set(shots)
    for k, (_, n, _) in key.items():
        assert shots[k] == n


def test_keyframe_within_shot_range(spark):
    rows = [(1, i, (i // 5) * 0xF0F) for i in range(15)]
    got = _run(spark, rows, threshold=2)
    segs = {
        (r.media_id, r.shot_id): (r.start_frame, r.end_frame)
        for r in multimodal.video_shot_segments(
            _fh(spark, rows), threshold=2
        ).collect()
    }
    for k, (kf, _, _) in got.items():
        lo, hi = segs[k]
        assert lo <= kf <= hi


def test_shot_size_guard_fires(spark):
    rows = [(1, i, 0) for i in range(10)]
    with pytest.raises(Exception, match="max_shot_frames"):
        multimodal.video_keyframes(
            _fh(spark, rows), threshold=10, max_shot_frames=4
        ).collect()


def test_synthetic_clips_match_duckdb_twin(spark):
    """End-to-end on the planted cut clips: Spark pixel decode →
    frame dHash → keyframes equals the twin run on the SAME hashes
    (hash extraction itself is pinned by the video_shots oracle)."""
    import duckdb

    media = multimodal.synthetic_cut_video_media(spark, n=6)
    fh = multimodal.video_frame_dhash(media)
    rows = [(r.media_id, r.frame_idx, r.fhash) for r in fh.collect()]
    got = {
        (r.media_id, r.shot_id): (r.keyframe_idx, r.n_frames,
                                  r.sum_hamming)
        for r in multimodal.video_keyframes(fh, threshold=10).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE fh(media_id BIGINT, frame_idx INTEGER, "
        "fhash BIGINT)"
    )
    con.executemany("INSERT INTO fh VALUES (?, ?, ?)", rows)
    want = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(
            multimodal.video_keyframes_sql("fh", threshold=10)
        ).fetchall()
    }
    assert got == want
    assert len(got) >= 6 * 2        # planted cuts → multiple shots

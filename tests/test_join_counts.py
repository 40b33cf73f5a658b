"""Join-count spatial autocorrelation (spatial.tile_join_counts)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("joincount-tests", master="local[4]",
                    shuffle_partitions=8)


def _raster(spark, rows):
    return spark.createDataFrame(rows, "cell bigint, flag boolean")


def _grid(r0, c0, h, w, flag_fn, cols=1440):
    return [((r0 + i) * cols + c0 + j, flag_fn(i, j))
            for i in range(h) for j in range(w)]


def test_pair_count_of_a_full_block(spark):
    """An h×w interior block has 4hw − 3h − 3w + 2 queen pairs — the
    once-per-pair contract, checked against the closed form."""
    for h, w in ((3, 3), (4, 6)):
        rows = _grid(100, 100, h, w, lambda i, j: True)
        out = spatial.tile_join_counts(_raster(spark, rows), "flag") \
            .collect()[0]
        expect = 4 * h * w - 3 * h - 3 * w + 2
        assert out.n_pairs == expect, (h, w, out.n_pairs)
        assert (out.bb, out.bw, out.ww) == (expect, 0, 0)
        assert out.n_cells == h * w


def test_checkerboard_is_all_bw_on_rook_axes(spark):
    """A checkerboard: rook-adjacent pairs are mixed, diagonal pairs
    are same-color — exact split of the queen pair set."""
    h = w = 4
    rows = _grid(200, 200, h, w, lambda i, j: (i + j) % 2 == 0)
    out = spatial.tile_join_counts(_raster(spark, rows), "flag") \
        .collect()[0]
    rook = 2 * h * w - h - w          # horizontal + vertical pairs
    diag = out.n_pairs - rook
    assert out.bw == rook
    assert out.bb + out.ww == diag


def test_clustered_vs_dispersed_signal(spark):
    """Same 50/50 color balance, opposite arrangements: the clustered
    map must score far more BB joins than the dispersed one."""
    h = w = 8
    half = _grid(300, 300, h, w, lambda i, j: i < h // 2)
    board = _grid(400, 400, h, w, lambda i, j: (i + j) % 2 == 0)
    r_half = spatial.tile_join_counts(
        _raster(spark, half), "flag").collect()[0]
    r_board = spatial.tile_join_counts(
        _raster(spark, board), "flag").collect()[0]
    # clustered: mixed joins only along the single boundary (8 rook +
    # 14 diagonal = 22); dispersed: every rook pair mixed (112)
    assert r_half.bw == 22 and r_board.bw == 112
    assert r_half.bb > r_board.bb  # 94 interior vs 49 diagonal-only


def test_lon_wrap_pair_counted_once(spark):
    rows = [(0 * 1440 + 1439, True), (0 * 1440 + 0, True)]
    out = spatial.tile_join_counts(_raster(spark, rows), "flag") \
        .collect()[0]
    assert (out.n_pairs, out.bb) == (1, 1)


def test_duckdb_twin_matches(spark):
    rng = random.Random(6)
    rows = list({
        ((rng.randrange(100, 130)) * 1440 + rng.randrange(100, 130),
         rng.random() < 0.4)
        for _ in range(400)
    })
    # dedupe cells (keep first flag)
    seen, uniq = set(), []
    for c, f in rows:
        if c not in seen:
            seen.add(c)
            uniq.append((c, f))
    got = spatial.tile_join_counts(_raster(spark, uniq), "flag") \
        .collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE r(cell BIGINT, flag BOOLEAN)")
    con.executemany("INSERT INTO r VALUES (?, ?)", uniq)
    want = con.execute(
        spatial.tile_join_counts_sql("r", "flag")).fetchall()[0]
    assert tuple(got) == tuple(want)


def test_coarse_grid_rejected(spark):
    with pytest.raises(ValueError):
        spatial.tile_join_counts(
            _raster(spark, [(1, True)]), "flag", res_deg=90.0)

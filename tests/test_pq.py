"""Product-quantization encoding (similarity.pq_encode) — hand-
verifiable codebooks, ceil-split subvectors, reconstruction-error
sanity, and DuckDB twin parity on random float32 values (the
float32-promotion regime that bit the centroid op)."""

import random

import duckdb
import numpy as np
import pytest

from openstreetmap_license_change_spark.operators import similarity


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("pq-tests", master="local[4]", shuffle_partitions=8)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def test_two_code_hand_case(spark):
    """Four 4-dim vectors, 2 codes seeded by parity: evens are all
    [0,0,1,1], odds all [1,1,0,0] — each codebook entry IS its class,
    so every vector encodes to its own seed with zero error."""
    rows = [
        (0, [0.0, 0.0, 1.0, 1.0]),
        (2, [0.0, 0.0, 1.0, 1.0]),
        (1, [1.0, 1.0, 0.0, 0.0]),
        (3, [1.0, 1.0, 0.0, 0.0]),
    ]
    out = similarity.pq_encode(_df(spark, rows), m=2, codes=2).collect()
    got = {(r.vec_id, r.sub): (r.code, r.dist_q) for r in out}
    assert len(got) == 8
    for vid, _ in rows:
        for sub in (0, 1):
            assert got[(vid, sub)] == (vid % 2, 0)


def test_subvector_ceil_split(spark):
    """D=5, m=2 → widths 3 and 2 (remainder in the last subvector)."""
    rows = [(0, [0.1] * 5), (1, [0.2] * 5)]
    out = similarity.pq_encode(_df(spark, rows), m=2, codes=2).collect()
    assert {r.sub for r in out} == {0, 1}
    assert len(out) == 4


def test_codes_bounded_and_error_nonneg(spark):
    rng = random.Random(2)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)
    ]
    out = similarity.pq_encode(_df(spark, rows), m=4, codes=5).collect()
    assert all(0 <= r.code < 5 for r in out)
    assert all(r.dist_q >= 0 for r in out)
    assert len(out) == 40 * 4


def test_duckdb_twin_parity_float32(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(12).astype(np.float32)])
        for i in range(50)
    ]
    got = sorted(
        tuple(r)
        for r in similarity.pq_encode(
            _df(spark, rows), m=3, codes=4
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    twin = sorted(
        tuple(r)
        for r in con.execute(
            similarity.pq_encode_sql("embeddings", m=3, codes=4)
        ).fetchall()
    )
    assert got == twin


# ---------------------------------------------------------------------------
# pq_search (ADC)
# ---------------------------------------------------------------------------

def _round_away(y):
    """Engine ROUND: half away from zero on the double (Python's
    built-in round is banker's and disagrees at exact .5)."""
    import math

    return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))


def _pq_python(rows, query, m, codes, k, scale=10**6):
    """Full ADC pipeline in plain ints: quantize, mod-seed codebook,
    encode, query LUT, summed lookups, (dist, id) top-k."""
    d = len(rows[0][1])
    width = (d + m - 1) // m
    quant = {
        vid: [_round_away(float(v) * scale) for v in vec]
        for vid, vec in rows
    }
    cb = {}
    for vid, qs in quant.items():
        for i, qval in enumerate(qs):
            cb.setdefault((vid % codes, i), []).append(qval)
    def _tdiv(a, b):  # engine DIV truncates toward zero; // floors
        return a // b if a >= 0 else -((-a) // b)

    mean = {key: _tdiv(sum(v), len(v)) for key, v in cb.items()}
    enc = {}
    for vid, qs in quant.items():
        for sub in range(m):
            dims = [i for i in range(d) if i // width == sub]
            best = min(
                (sum((qs[i] - mean[(c, i)]) ** 2 for i in dims), c)
                for c in range(codes)
            )
            enc[(vid, sub)] = best[1]
    qq = [_round_away(float(v) * scale) for v in query]
    lut = {
        (sub, c): sum(
            (qq[i] - mean[(c, i)]) ** 2
            for i in range(d) if i // width == sub
        )
        for sub in range(m) for c in range(codes)
    }
    scores = {}
    for vid in quant:
        scores[vid] = sum(lut[(s, enc[(vid, s)])] for s in range(m))
    return sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:k]


def test_pq_search_matches_python_and_duckdb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i + 1,
         [float(x) for x in rng.standard_normal(12).astype(np.float32)])
        for i in range(60)
    ]
    query = [float(x) for x in rng.standard_normal(12).astype(np.float32)]
    want = _pq_python(rows, query, m=3, codes=4, k=8)
    got = [
        (r.vec_id, r.approx_dist_q)
        for r in similarity.pq_search(
            _df(spark, rows), query, k=8, m=3, codes=4
        ).collect()
    ]
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO emb VALUES (?, ?)", rows)
    con.execute("CREATE TABLE q (embedding DOUBLE[])")
    con.execute("INSERT INTO q VALUES (?)", [query])
    twin = [
        tuple(r)
        for r in con.execute(
            similarity.pq_search_sql("emb", "q", k=8, m=3, codes=4)
        ).fetchall()
    ]
    assert twin == want


def test_pq_search_recall_against_exact(spark):
    """ADC over 4×8 codes must keep meaningful recall vs exact
    quantized L2 — clustered data where PQ is actually informative."""
    rng = np.random.default_rng(21)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(80):
        c = centers[i % 4]
        rows.append(
            (i + 1, [float(x) for x in
                     (c + rng.standard_normal(16) * 0.2)
                     .astype(np.float32)])
        )
    query = [float(x) for x in
             (centers[0] + rng.standard_normal(16) * 0.2)
             .astype(np.float32)]
    approx = {
        r.vec_id
        for r in similarity.pq_search(
            _df(spark, rows), query, k=10, m=4, codes=8
        ).collect()
    }
    qarr = np.array(query)
    exact = sorted(
        ((np.sum((np.array(v) - qarr) ** 2), vid) for vid, v in rows)
    )[:10]
    exact_ids = {vid for _, vid in exact}
    assert len(approx & exact_ids) >= 5

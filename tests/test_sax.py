"""SAX symbolization (temporal.sax_words) — hand-pinned words,
constant-series convention, tail drop, short keys dropped, strict
breakpoint rule, random ≡ exact integer mirror ≡ twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import temporal
from openstreetmap_license_change_spark.operators.temporal import (
    SAX_BREAKPOINTS_PPM,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("sax-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "k string, t long, x long"


def _run(spark, rows, segments=4, alphabet=4):
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.sax_words(
        df, "k", "t", "x", segments=segments, alphabet=alphabet
    ).collect()
    return {r.k: (r.n_used, r.sax_word) for r in out}


def _mirror(rows, segments=4, alphabet=4):
    letters = "abcdefgh"
    bps = SAX_BREAKPOINTS_PPM[alphabet]
    by_key = {}
    for k, t, x in rows:
        by_key.setdefault(k, []).append((t, x))
    out = {}
    for k, pts in by_key.items():
        pts.sort()
        xs = [x for _, x in pts]
        n = len(xs)
        if n < segments:
            continue
        w = n // segments
        xs = xs[: w * segments]
        nu = len(xs)
        s = sum(xs)
        q = sum(v * v for v in xs)
        d = nu * q - s * s
        word = []
        for g in range(segments):
            sseg = sum(xs[g * w:(g + 1) * w])
            l = (sseg * nu - w * s) * 10**6
            idx = 0
            for b in bps:
                if b == 0:
                    idx += 1 if l > 0 else 0
                elif b > 0:
                    idx += 1 if (l > 0 and l * l > b * b * w * w * d) \
                        else 0
                else:
                    idx += 1 if (l >= 0 or l * l < b * b * w * w * d) \
                        else 0
            word.append(letters[idx])
        out[k] = (nu, "".join(word))
    return out


def test_two_level_step(spark):
    # 0,0,0,0,10,10,10,10 → z = ±1, beyond ±0.6745 → "aadd"
    rows = [("s", t, 0) for t in range(4)] \
        + [("s", t, 10) for t in range(4, 8)]
    got = _run(spark, rows, segments=4)
    assert got == {"s": (8, "aadd")}
    assert got == _mirror(rows, segments=4)


def test_hand_pinned_mixed(spark):
    # [0, 5, 10, 5]: z = −1.414, 0, +1.414, 0 → "abdb" under the
    # strict rule (z = 0 sits above −q but not above 0)
    rows = [("m", 0, 0), ("m", 1, 5), ("m", 2, 10), ("m", 3, 5)]
    got = _run(spark, rows, segments=4)
    assert got == {"m": (4, "abdb")}
    assert got == _mirror(rows, segments=4)


def test_constant_series_maps_to_b(spark):
    rows = [("c", t, 7) for t in range(8)]
    got = _run(spark, rows, segments=4)
    assert got == {"c": (8, "bbbb")}


def test_tail_dropped(spark):
    # n=10, segments=4 → w=2, used=8: the two huge tail values are
    # dropped and must not touch the word
    rows = [("s", t, 0) for t in range(4)] \
        + [("s", t, 10) for t in range(4, 8)] \
        + [("s", 8, 10**6), ("s", 9, -10**6)]
    got = _run(spark, rows, segments=4)
    assert got == {"s": (8, "aadd")}
    assert got == _mirror(rows, segments=4)


def test_short_keys_dropped(spark):
    rows = [("tiny", 0, 1), ("tiny", 1, 2)]
    assert _run(spark, rows, segments=4) == {}


def test_alphabet_8(spark):
    # step series at a=8: z = ±1 sits between octile breakpoints
    # 0.6745 and 1.1503 → strictly-above counts 1 and 6 → 'b'/'g'
    rows = [("s", t, 0) for t in range(4)] \
        + [("s", t, 10) for t in range(4, 8)]
    got = _run(spark, rows, segments=4, alphabet=8)
    assert got == {"s": (8, "bbgg")}
    assert got == _mirror(rows, segments=4, alphabet=8)


def test_validation(spark):
    rows = [("s", 0, 1)]
    with pytest.raises(ValueError, match="alphabet"):
        _run(spark, rows, alphabet=5)
    with pytest.raises(ValueError, match="segments"):
        _run(spark, rows, segments=0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(6060)
    rows = []
    for k in range(20):
        for t in range(rng.randrange(3, 40)):
            rows.append((f"k{k:02d}", t, rng.randrange(-50, 51)))
    got = _run(spark, rows, segments=6)
    assert got == _mirror(rows, segments=6)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, t BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(temporal.sax_words_sql(
        "t", "k", "t", "x", segments=6
    )).fetchall()
    assert {r[0]: (r[1], r[2]) for r in out} == got

"""Charset/script profile (textops.charset_profile) — mixed-script
plants, exact remainder, a Python codepoint mirror, and DuckDB twin
parity (two regex dialects, one char-set semantics)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("charset-tests", master="local[4]",
                    shuffle_partitions=8)


RANGES = {
    "ascii_alpha": [(0x41, 0x5A), (0x61, 0x7A)],
    "digit": [(0x30, 0x39)],
    "space": [(0x20, 0x20), (0x09, 0x0A), (0x0D, 0x0D)],
    "ascii_punct": [(0x21, 0x2F), (0x3A, 0x40), (0x5B, 0x60),
                    (0x7B, 0x7E)],
    "latin_ext": [(0xC0, 0x24F)],
    "cjk": [(0x4E00, 0x9FFF)],
    "cyrillic": [(0x400, 0x4FF)],
    "arabic": [(0x600, 0x6FF)],
}


def _python(texts):
    out = {}
    for i, t in enumerate(texts):
        counts = {k: 0 for k in RANGES}
        for ch in t:
            cp = ord(ch)
            for k, rs in RANGES.items():
                if any(a <= cp <= b for a, b in rs):
                    counts[k] += 1
                    break
        other = len(t) - sum(counts.values())
        out[i] = (len(t), *[counts[k] for k in RANGES], other)
    return out


def _spark(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = textops.charset_profile(df).collect()
    keys = ["n_chars"] + [f"n_{k}" for k in RANGES] + ["n_other"]
    return {r["doc_id"]: tuple(r[k] for k in keys) for r in rows}


def test_mixed_script_plant(spark):
    texts = ["héllo 世界 a1! Привет مرحبا"]
    got = _spark(spark, texts)
    want = _python(texts)
    assert got == want
    n = got[0]
    # hand-check a few: 'héllo'→4 ascii + 1 latin_ext, 世界→2 cjk,
    # Привет→6 cyrillic, مرحبا→5 arabic
    assert n[5] == 1     # latin_ext (é)
    assert n[6] == 2     # cjk
    assert n[7] == 6     # cyrillic
    assert n[8] == 5     # arabic
    assert n[9] == 0     # other: everything classified


def test_other_remainder_exact(spark):
    texts = ["a☃b"]  # snowman is OTHER
    got = _spark(spark, texts)
    assert got[0][0] == 3 and got[0][-1] == 1


def test_pure_ascii(spark):
    texts = ["Hello, world 42!"]
    got = _spark(spark, texts)
    assert got == _python(texts)
    assert got[0][-1] == 0


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(135)
    pools = ["abcXYZ", "0123", "   ", ".,!?", "éàñŐ", "世界漢字",
             "Привет", "مرحبا", "☃♥"]
    texts = [
        "".join(rng.choice(rng.choice(pools))
                for _ in range(rng.randrange(1, 60)))
        for _ in range(40)
    ]
    want = _python(texts)
    assert _spark(spark, texts) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)",
                    list(enumerate(texts)))
    rows = con.execute(
        textops.charset_profile_sql("d")
    ).fetchall()
    got = {r[0]: tuple(r[1:]) for r in rows}
    assert got == want

"""Winnowing fingerprints (textops.winnow_fingerprints) — the MOSS
selection rule (window minimum, rightmost tie), the winnowing
guarantee on planted plagiarism, short-doc domain, a plain-Python
mirror, and DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("winnow-tests", master="local[4]",
                    shuffle_partitions=8)


K, WIN = 8, 4


def _norm(t):
    import re
    return re.sub(r"\s+", " ", t.lower()).strip()


def _hash(s):
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % 2_147_483_647
    return h


def _python(texts, k=K, window=WIN):
    out = {}
    for i, t in enumerate(texts):
        s = _norm(t)
        if len(s) < k + window - 1:
            continue
        hs = [(_hash(s[p:p + k]), p + 1) for p in range(len(s) - k + 1)]
        sel = set()
        for j in range(len(hs) - window + 1):
            frame = hs[j:j + window]
            mh = min(h for h, _ in frame)
            pos = max(p for h, p in frame if h == mh)
            sel.add((pos, mh))
        out[i] = sel
    return out


def _spark(spark, texts, k=K, window=WIN):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = textops.winnow_fingerprints(df, k=k, window=window).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["fhash"]))
    return out


def test_matches_python_mirror(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the quick brown fox jumps over the lazy dog " * 3,
    ]
    assert _spark(spark, texts) == _python(texts)


def test_winnowing_guarantee(spark):
    """Two docs sharing a substring of length ≥ w+k−1 share at least
    one fingerprint — the paper's central theorem, on a planted
    plagiarized passage."""
    shared = "this exact passage was lifted verbatim from the source"
    texts = [
        "intro words before " + shared + " and some trailing text",
        "completely different opener yet " + shared + " then more",
        "an unrelated document with none of that content in it at all",
    ]
    got = _spark(spark, texts)
    f0 = {h for _, h in got[0]}
    f1 = {h for _, h in got[1]}
    f2 = {h for _, h in got[2]}
    assert f0 & f1, "shared passage must share a fingerprint"
    assert not (f0 & f2) or len(f0 & f2) < len(f0 & f1)


def test_short_doc_no_fingerprints(spark):
    texts = ["tiny", "exactly11c"]  # both < k+w-1 = 11 normalized chars
    got = _spark(spark, texts)
    assert got == {}


def test_density_bound(spark):
    """Selected fingerprints are ≤ the number of full windows and ≥ 1
    per disjoint window block (coverage, not silent skipping)."""
    t = "abcdefghijklmnopqrstuvwxyz0123456789" * 4
    got = _spark(spark, [t])[0]
    s = _norm(t)
    n_windows = len(s) - K + 1 - WIN + 1
    assert 1 <= len(got) <= n_windows
    assert len(got) >= n_windows // (2 * WIN)


def test_validation(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k and window"):
        textops.winnow_fingerprints(df, k=0)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(4242)
    texts = []
    for _ in range(30):
        texts.append("".join(
            rng.choice("abcde ") for _ in range(rng.randrange(5, 120))
        ))
    want = _python(texts)
    assert _spark(spark, texts) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)",
                    list(enumerate(texts)))
    rows = con.execute(
        textops.winnow_fingerprints_sql("d", k=K, window=WIN)
    ).fetchall()
    got = {}
    for did, pos, fh in rows:
        got.setdefault(did, set()).add((pos, fh))
    assert got == want

"""Topic-shift gaps (textops.topic_gaps) — planted vocabulary switch,
uniform-document continuity, tail-block sizing, single-block absence,
validation, and DuckDB twin parity on random block documents."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("topicgaps-tests", master="local[4]",
                    shuffle_partitions=8)


def _py(texts, block_size=20, threshold_ppm=100_000):
    out = {}
    for doc, t in texts:
        ws = [w for w in t.lower().split() if w]
        blocks = {}
        for i, w in enumerate(ws):
            blocks.setdefault(i // block_size, set()).add(w)
        rows = []
        for g in sorted(blocks):
            if g + 1 not in blocks:
                continue
            inter = len(blocks[g] & blocks[g + 1])
            union = len(blocks[g] | blocks[g + 1])
            sim = inter * 1_000_000 // union
            rows.append((g, inter, union, sim, sim < threshold_ppm))
        if rows:
            out[doc] = rows
    return out


def _spark(spark, texts, block_size=20, threshold_ppm=100_000):
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    rows = textops.topic_gaps(
        df, block_size=block_size, threshold_ppm=threshold_ppm
    ).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["gap"], r["n_inter"], r["n_union"], r["sim_ppm"],
             r["is_boundary"])
        )
    return {d: sorted(v) for d, v in out.items()}


def test_planted_vocab_switch(spark):
    # blocks 0-1 use vocab A, blocks 2-3 vocab B → boundary at gap 1
    a = " ".join(f"alpha{i % 5}" for i in range(40))
    b = " ".join(f"beta{i % 5}" for i in range(40))
    got = _spark(spark, [(1, a + " " + b)])[1]
    assert [g for g, *_ in got] == [0, 1, 2]
    by_gap = {g: (i, u, s, fl) for g, i, u, s, fl in got}
    assert by_gap[0][3] is False          # A-A continuity
    assert by_gap[1] == (0, 10, 0, True)  # A|B — disjoint vocab
    assert by_gap[2][3] is False          # B-B continuity


def test_uniform_doc_no_boundaries(spark):
    t = " ".join(f"w{i % 7}" for i in range(100))
    got = _spark(spark, [(2, t)])[2]
    assert all(not fl for *_, fl in got)


def test_tail_block_true_size(spark):
    # 25 tokens at block 20 → blocks of 20 and 5 distinct-ish tokens
    t = " ".join(f"t{i}" for i in range(25))
    got = _spark(spark, [(3, t)])[3]
    assert got == [(0, 0, 25, 0, True)]


def test_single_block_absent(spark):
    got = _spark(spark, [(4, "only a few words here")])
    assert 4 not in got


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="block_size"):
        textops.topic_gaps(df, block_size=0)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(303)
    vocabs = [[f"v{k}_{j}" for j in range(8)] for k in range(3)]
    texts = []
    for d in range(30):
        words = []
        for seg in range(rng.randrange(1, 5)):
            v = rng.choice(vocabs)
            words += [rng.choice(v) for _ in range(rng.randrange(5, 50))]
        texts.append((d, " ".join(words)))
    want = _py(texts)
    assert _spark(spark, texts) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", texts)
    rows = con.execute(textops.topic_gaps_sql("docs")).fetchall()
    got = {}
    for d, g, i, u, s, fl in rows:
        got.setdefault(d, []).append((g, i, u, s, fl))
    got = {d: sorted(v) for d, v in got.items()}
    assert got == want

"""TextTiling (textops.text_tiles) — topic switch cuts at the
zero-overlap valley, homogeneous docs stay whole, edge gaps never
fire, threshold bites, tail dropped, random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("tile-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "doc_id long, text string"


def _run(spark, rows, w=4, thr=(4, 5)):
    df = spark.createDataFrame(rows, SCHEMA)
    out = textops.text_tiles(
        df, block_tokens=w, thr_num=thr[0], thr_den=thr[1]
    ).collect()
    return sorted((r.doc_id, r.gap_idx, r.sim_ppm) for r in out)


def _mirror(rows, w=4, thr=(4, 5)):
    out = []
    for did, text in rows:
        toks = [t for t in text.lower().split() if t]
        nb = len(toks) // w
        blocks = [toks[b * w:(b + 1) * w] for b in range(nb)]

        def cnt(b):
            c = {}
            for t in b:
                c[t] = c.get(t, 0) + 1
            return c

        cs = [cnt(b) for b in blocks]
        sims = []
        for g in range(nb - 1):
            a, b = cs[g], cs[g + 1]
            dot = sum(v * b.get(t, 0) for t, v in a.items())
            na = sum(v * v for v in a.values())
            nbn = sum(v * v for v in b.values())
            sims.append((dot * dot * 10**6) // (na * nbn))
        tot, ng = sum(sims), len(sims)
        for g in range(1, ng - 1):
            if (sims[g] < sims[g - 1] and sims[g] < sims[g + 1]
                    and sims[g] * ng * thr[1] < thr[0] * tot):
                out.append((did, g, sims[g]))
    return sorted(out)


def test_topic_switch_cuts_at_valley(spark):
    doc = "cat cat cat cat cat cat cat cat " \
          "dog dog dog dog dog dog dog dog"
    got = _run(spark, [(1, doc)])
    assert got == [(1, 1, 0)]
    assert got == _mirror([(1, doc)])


def test_homogeneous_doc_stays_whole(spark):
    doc = " ".join(["word"] * 20)
    assert _run(spark, [(1, doc)]) == []


def test_edge_gaps_never_fire(spark):
    # the dissimilar block sits at the END: the valley has no right
    # neighbour, so no boundary
    doc = "cat cat cat cat cat cat cat cat dog dog dog dog"
    assert _run(spark, [(1, doc)]) == []


def test_threshold_bites(spark):
    # mild topic shift (3 of 4 tokens shared): a strict threshold
    # mutes the valley, a permissive one keeps it
    doc = "aa bb cc dd " * 2 + "aa bb cc gg " * 2
    strict = _run(spark, [(1, doc)], thr=(1, 2))
    loose = _run(spark, [(1, doc)], thr=(2, 1))
    assert strict == []
    assert len(loose) >= 1
    assert loose == _mirror([(1, doc)], thr=(2, 1))


def test_tail_dropped(spark):
    base = "cat cat cat cat cat cat cat cat " \
           "dog dog dog dog dog dog dog dog"
    with_tail = base + " zebra yak emu"
    assert _run(spark, [(1, with_tail)]) == [(1, 1, 0)]


def test_validation(spark):
    with pytest.raises(ValueError, match="block_tokens"):
        _run(spark, [(1, "a b")], w=1)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(818181)
    pool_a = ["data", "spark", "query", "scan", "merge"]
    pool_b = ["tiger", "lion", "zebra", "hyena", "rhino"]
    rows = []
    for d in range(20):
        n1 = rng.randrange(8, 30)
        n2 = rng.randrange(8, 30)
        words = [rng.choice(pool_a) for _ in range(n1)] \
            + [rng.choice(pool_b) for _ in range(n2)]
        rows.append((d, " ".join(words)))
    got = _run(spark, rows, w=5)
    assert got == _mirror(rows, w=5)
    assert len(got) > 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(
        textops.text_tiles_sql("t", block_tokens=5)
    ).fetchall()
    assert sorted(tuple(r) for r in out) == got

"""Prefix-filtered exact Jaccard join (dedup.jaccard_prefix_join) —
completeness vs brute force (including stop-token-only overlaps the
df-cap scheme would drop), threshold boundary exactness, prefix-length
edge cases, twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import dedup


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("jprefix-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, sets, tau_ppm):
    rows = [(d, t) for d, toks in sets.items() for t in toks]
    df = spark.createDataFrame(rows, "doc_id bigint, shingle string")
    out = dedup.jaccard_prefix_join(
        df, threshold_ppm=tau_ppm
    ).collect()
    return {
        (r.doc_a, r.doc_b): (r.size_a, r.size_b, r.inter,
                             r.jaccard_ppm)
        for r in out
    }


def _brute(sets, tau_ppm):
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = set(sets[a]), set(sets[b])
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter * 10**6 >= tau_ppm * union:
                out[(a, b)] = (
                    len(sa), len(sb), inter,
                    (inter * 10**6) // union,
                )
    return out


def test_exact_duplicates_found(spark):
    sets = {1: ["a", "b", "c"], 2: ["a", "b", "c"], 3: ["x", "y"]}
    got = _run(spark, sets, 1_000_000)
    assert got == {(1, 2): (3, 3, 3, 1_000_000)}


def test_stop_token_only_overlap_not_dropped(spark):
    """Two docs overlapping ONLY in the corpus's most frequent tokens
    still clear τ — the pair a df-capped candidate scheme loses; the
    prefix filter must keep it (completeness is unconditional)."""
    sets = {i: ["the", "of", f"u{i}"] for i in range(10)}
    # docs 0 and 1 share {the, of}: jaccard = 2/4 = 0.5
    got = _run(spark, sets, 500_000)
    assert got == _brute(sets, 500_000)
    assert (0, 1) in got


def test_threshold_boundary_inclusive(spark):
    """jaccard exactly τ must be INCLUDED (cross-multiplied ≥)."""
    sets = {1: ["a", "b", "c", "d"], 2: ["a", "b", "c", "e"]}
    # inter 3, union 5 → 0.6 exactly
    got = _run(spark, sets, 600_000)
    assert (1, 2) in got and got[(1, 2)][3] == 600_000
    assert _run(spark, sets, 600_001) == {}


def test_prefix_len_tau_one(spark):
    """τ = 1.0 → prefix_len = 1: only exact-set duplicates can pair,
    and the single rarest token suffices to find them."""
    sets = {1: list("abcdef"), 2: list("abcdef"), 3: list("abcdeg")}
    got = _run(spark, sets, 1_000_000)
    assert set(got) == {(1, 2)}


def test_random_completeness_vs_brute(spark):
    """Zipf-ish vocabulary, random sets: the prefix join must equal
    brute force at several thresholds — completeness AND no false
    positives."""
    rng = random.Random(67)
    vocab = [f"t{i}" for i in range(40)]
    weights = [1.0 / (i + 1) for i in range(40)]
    sets = {}
    for d in range(40):
        k = rng.randrange(3, 12)
        toks = set()
        while len(toks) < k:
            toks.add(rng.choices(vocab, weights=weights)[0])
        sets[d] = sorted(toks)
    for tau in (400_000, 500_000, 700_000, 900_000):
        got = _run(spark, sets, tau)
        assert got == _brute(sets, tau), f"tau={tau}"


def test_duckdb_twin_parity(spark):
    rng = random.Random(71)
    sets = {
        d: sorted({f"t{rng.randrange(25)}"
                   for _ in range(rng.randrange(3, 10))})
        for d in range(30)
    }
    got = _run(spark, sets, 500_000)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, shingle VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(d, tk) for d, toks in sets.items() for tk in toks],
    )
    rows = con.execute(
        dedup.jaccard_prefix_join_sql("t", threshold_ppm=500_000)
    ).fetchall()
    assert {(r[0], r[1]): tuple(r[2:]) for r in rows} == got
    assert len(got) > 0


def test_params(spark):
    with pytest.raises(ValueError, match="threshold_ppm"):
        dedup.jaccard_prefix_join_sql("t", threshold_ppm=0)

"""Krippendorff's alpha (evaluation.krippendorff_alpha) — ragged
panels, single-rating drop rule, perfect/chance/degenerate cases,
Fleiss reduction on rectangular panels, Fraction mirror ≡ twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("kripp-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "grp string, it long, cat string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = evaluation.krippendorff_alpha(df, "grp", "it", "cat")
    return {r.grp: (r.n_items, r.n_ratings, r.alpha_ppm)
            for r in out.collect()}


def _mirror(rows):
    # exact Fraction replay of the definition (not the cleared form)
    from collections import defaultdict

    items = defaultdict(lambda: defaultdict(int))
    for g, it, c in rows:
        items[(g, it)][c] += 1
    groups = defaultdict(list)
    for (g, it), hist in items.items():
        if sum(hist.values()) >= 2:
            groups[g].append(hist)
    out = {}
    for g, hists in groups.items():
        n = sum(sum(h.values()) for h in hists)
        marg = defaultdict(int)
        for h in hists:
            for c, v in h.items():
                marg[c] += v
        de_num = n * n - sum(v * v for v in marg.values())
        if n < 2 or de_num == 0:
            out[g] = (len(hists), n, None)
            continue
        do = sum(
            Fraction(
                sum(h.values()) ** 2 - sum(v * v for v in h.values()),
                sum(h.values()) - 1,
            )
            for h in hists
        )
        alpha = 1 - (n - 1) * do / de_num
        ppm = alpha * 1_000_000
        # sign-decomposed trunc toward zero
        q = int(abs(ppm))
        out[g] = (len(hists), n, -q if ppm < 0 else q)
    return out


def test_perfect_agreement_ragged(spark):
    # ragged panel (2 and 3 raters) in FULL agreement → α = 1
    rows = [("g", 1, "a"), ("g", 1, "a"),
            ("g", 2, "b"), ("g", 2, "b"), ("g", 2, "b")]
    got = _run(spark, rows)
    assert got == {"g": (2, 5, 1_000_000)}


def test_single_rating_items_dropped(spark):
    # item 3 has one rating — it must not influence α or the counts
    rows = [("g", 1, "a"), ("g", 1, "a"),
            ("g", 2, "b"), ("g", 2, "b"), ("g", 3, "a")]
    got = _run(spark, rows)
    assert got["g"][0] == 2 and got["g"][1] == 4
    assert got == _mirror(rows)


def test_textbook_value(spark):
    # Krippendorff's own worked nominal example (2 coders, 12 units
    # scored, units with one rating dropped): α = 0.692 for
    # 10 pairable units, agreement on 8.  Construct: 8 agree-pairs
    # (4×a, 4×b), 2 disagree-pairs.
    rows = []
    it = 0
    for cat in ("a", "a", "a", "a", "b", "b", "b", "b"):
        rows += [("g", it, cat), ("g", it, cat)]
        it += 1
    rows += [("g", it, "a"), ("g", it, "b")]
    it += 1
    rows += [("g", it, "b"), ("g", it, "a")]
    got = _run(spark, rows)
    assert got == _mirror(rows)
    # Do = 2·(2/1)/…; exact value: 1 − 19·(2+2)/ (20²−(10²+10²)) = 1 − 76/200
    assert got["g"] == (10, 20, 620_000)


def test_degenerate_one_category_null(spark):
    rows = [("g", 1, "a"), ("g", 1, "a"), ("g", 2, "a"), ("g", 2, "a")]
    got = _run(spark, rows)
    assert got["g"] == (2, 4, None)


def test_worse_than_chance_negative(spark):
    # systematic disagreement: every pair splits a/b → α < 0
    rows = []
    for it in range(4):
        rows += [("g", it, "a"), ("g", it, "b")]
    got = _run(spark, rows)
    assert got == _mirror(rows)
    assert got["g"][2] < 0


def test_random_ragged_vs_mirror_and_twin(spark):
    rng = random.Random(4242)
    rows = []
    for g in ("g1", "g2"):
        for it in range(60):
            for _ in range(rng.randrange(1, 6)):
                rows.append((g, it, rng.choice(["a", "b", "c"])))
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(grp VARCHAR, it BIGINT, cat VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(evaluation.krippendorff_alpha_sql(
        "t", "grp", "it", "cat"
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got


def test_rating_bound_guard(spark):
    rows = [("g", 1, "a")] * (evaluation.KRIPP_MAX_RATINGS + 1)
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(Exception, match="more than"):
        evaluation.krippendorff_alpha(df, "grp", "it", "cat").collect()

"""Fleiss' kappa (evaluation.fleiss_kappa) — the worked Wikipedia-style
panel, perfect/chance/negative agreement, Cohen reduction at r=2,
ragged-panel loud failure, random ≡ Fraction mirror ≡ DuckDB twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("fleiss-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "grp string, it long, cat string"
    )
    out = evaluation.fleiss_kappa(df, "grp", "it", "cat").collect()
    return {r.grp: (r.n_items, r.n_raters, r.kappa_ppm) for r in out}


def _trunc_ppm(num, den):
    q = abs(num) * 1_000_000 // den
    return -q if num < 0 else q


def _mirror(rows):
    bog = {}
    for g, it, cat in rows:
        bog.setdefault(g, {}).setdefault(it, {})
        bog[g][it][cat] = bog[g][it].get(cat, 0) + 1
    out = {}
    for g, items in bog.items():
        n = len(items)
        rs = {sum(c.values()) for c in items.values()}
        assert len(rs) == 1
        r = rs.pop()
        m = n * r
        a = sum(v * v for c in items.values() for v in c.values())
        tj = {}
        for c in items.values():
            for cat, v in c.items():
                tj[cat] = tj.get(cat, 0) + v
        b = sum(v * v for v in tj.values())
        num = (a - m) * m - b * (r - 1)
        den = (r - 1) * (m * m - b)
        k = None if (r < 2 or den == 0) else _trunc_ppm(num, den)
        out[g] = (n, r, k)
    return out


def _panel(g, ratings):
    """ratings: list per item of list of categories (one per rater)."""
    rows = []
    for i, cats in enumerate(ratings):
        for c in cats:
            rows.append((g, i, c))
    return rows


def test_perfect_agreement(spark):
    rows = _panel("p", [["a"] * 3, ["b"] * 3, ["a"] * 3])
    assert _run(spark, rows)["p"] == (3, 3, 1_000_000)


def test_worse_than_chance_negative(spark):
    # two items, two raters, always disagreeing with balanced
    # marginals: P_o = 0, P_e = 1/2 → κ = −1
    rows = _panel("n", [["a", "b"], ["b", "a"]])
    assert _run(spark, rows)["n"] == (2, 2, -1_000_000)


def test_hand_computed_fraction(spark):
    # N=2 r=3: item0 = {a:2,b:1}, item1 = {b:3}
    # A = 4+1+9 = 14, M = 6, B = 4 + 16 = 20
    # num = (14−6)·6 − 20·2 = 8 ; den = 2·(36−20) = 32 → κ = 1/4
    rows = _panel("h", [["a", "a", "b"], ["b", "b", "b"]])
    assert _run(spark, rows)["h"] == (2, 3, 250_000)


def test_reduces_to_cohen_on_shared_panel(spark):
    """At r=2 Fleiss' P̄ₑ uses pooled marginals (Scott/π-style), which
    equals Cohen's κ when both raters share the same marginal — pin
    that reduction on a symmetric panel."""
    pairs = [("a", "a")] * 6 + [("b", "b")] * 2 + \
            [("a", "b")] * 2 + [("b", "a")] * 2
    rows = _panel("c", [list(p) for p in pairs])
    got = _run(spark, rows)["c"]
    lab = [("c", i, p[0], p[1]) for i, p in enumerate(pairs)]
    sdf = spark.createDataFrame(
        lab, "grp string, it long, la string, lb string"
    )
    cohen = evaluation.cohen_kappa(sdf, "grp", "la", "lb").collect()
    assert got[2] == cohen[0].kappa_ppm


def test_ragged_panel_fails_loud(spark):
    rows = _panel("r", [["a", "b"], ["a"]])
    with pytest.raises(Exception, match="ragged"):
        _run(spark, rows)


def test_degenerate_constant_category_null(spark):
    rows = _panel("d", [["a", "a"], ["a", "a"]])
    assert _run(spark, rows)["d"][2] is None  # P_e = 1


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(515)
    rows = []
    for g in range(8):
        r = rng.randrange(2, 6)
        for i in range(rng.randrange(2, 25)):
            for _ in range(r):
                rows.append((f"g{g}", i, rng.choice("abc")))
    got = _run(spark, rows)
    assert got == _mirror(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(grp VARCHAR, it BIGINT, cat VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(
        evaluation.fleiss_kappa_sql("t", "grp", "it", "cat")
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

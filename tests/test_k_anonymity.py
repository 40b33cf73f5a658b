"""k-anonymity ladder (profile.k_anonymity_ladder) — hand-built
violating classes, monotone coarsening, drop-column terminal level,
suppression accounting, guards, random ≡ Python mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import profile


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("kanon-tests", master="local[4]",
                    shuffle_partitions=8)


DIVS = (1, 100, 0)


def _run(spark, rows, k=3):
    df = spark.createDataFrame(rows, "lang string, n long")
    out = profile.k_anonymity_ladder(
        df, ["lang"], "n", k=k, dividers=DIVS
    ).collect()
    return {
        r.level: (r.divider, r.n_classes, r.n_violating,
                  r.rows_suppressed, r.k_anonymous)
        for r in out
    }


def _mirror(rows, k=3):
    out = {}
    for lvl, d in enumerate(DIVS):
        classes = {}
        for lang, n in rows:
            key = (lang,) if d == 0 else (lang, n // d)
            classes[key] = classes.get(key, 0) + 1
        viol = {c: n for c, n in classes.items() if n < k}
        out[lvl] = (d, len(classes), len(viol), sum(viol.values()),
                    len(viol) == 0)
    return out


def test_ladder_semantics(spark):
    rows = [("en", 150)] * 5 + [("en", 151)] * 1 + [("de", 250)] * 2
    got = _run(spark, rows, k=3)
    # level 0 (exact): classes (en,150)=5 ok, (en,151)=1 and
    # (de,250)=2 violate → suppress 3 rows
    assert got[0] == (1, 3, 2, 3, False)
    # level 1 (÷100): (en,1)=6 ok, (de,2)=2 still violates
    assert got[1] == (100, 2, 1, 2, False)
    # level 2 (drop): en=6 ok, de=2 violates — k-anonymity needs
    # suppression even at the coarsest level
    assert got[2] == (0, 2, 1, 2, False)


def test_coarsening_reaches_anonymous(spark):
    rows = [("en", v) for v in (1, 99, 150, 199)] \
        + [("de", v) for v in (10, 20, 30)]
    got = _run(spark, rows, k=3)
    assert got[0][4] is False
    assert got[2] == (0, 2, 0, 0, True)


def test_guards(spark):
    with pytest.raises(ValueError, match="k must"):
        profile.k_anonymity_ladder(None, ["a"], "n", k=1)
    with pytest.raises(ValueError, match="dividers"):
        profile.k_anonymity_ladder(None, ["a"], "n", k=2,
                                   dividers=[-1])


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(555)
    rows = [
        (rng.choice(["en", "de", "fr"]), rng.randrange(0, 400))
        for _ in range(300)
    ]
    got = _run(spark, rows, k=4)
    assert got == _mirror(rows, k=4)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(lang VARCHAR, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(profile.k_anonymity_ladder_sql(
        "t", ["lang"], "n", k=4, dividers=DIVS
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

"""l-diversity ladder + t-closeness report (profile) — planted
homogeneous classes, skewed-distribution classes, NULL conventions,
exact-TVD Fraction mirror, random ≡ mirror ≡ twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import profile


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("privacy-tests", master="local[4]",
                    shuffle_partitions=8)


DIVS = (1, 100, 0)
SCHEMA = "lang string, n long, src string"


# ---------------------------------------------------------------- l


def _run_l(spark, rows, l=2):
    df = spark.createDataFrame(rows, SCHEMA)
    out = profile.l_diversity_ladder(
        df, ["lang"], "n", "src", l=l, dividers=DIVS
    ).collect()
    return {
        r.level: (r.divider, r.n_classes, r.n_violating,
                  r.rows_suppressed, r.l_diverse)
        for r in out
    }


def _mirror_l(rows, l=2):
    out = {}
    for lvl, d in enumerate(DIVS):
        classes = {}
        for lang, n, src in rows:
            key = (lang,) if d == 0 else (lang, n // d)
            cnt, flav = classes.get(key, (0, set()))
            if src is not None:
                flav = flav | {src}
            classes[key] = (cnt + 1, flav)
        viol = {c: n for c, (n, fl) in classes.items()
                if len(fl) < l}
        out[lvl] = (d, len(classes), len(viol), sum(viol.values()),
                    len(viol) == 0)
    return out


def test_homogeneity_attack_seen(spark):
    # (en,150) class is 5 rows — k=3-anonymous — but every row shares
    # one sensitive flavor: l-diversity flags what k-anonymity passes.
    rows = [("en", 150, "a")] * 5 + [("de", 150, "a")] * 2 \
        + [("de", 151, "b")] * 2
    got = _run_l(spark, rows, l=2)
    assert got[0] == (1, 3, 3, 9, False)
    # level 1 (÷100): (de,1) has {a,b}; (en,1) still homogeneous
    assert got[1] == (100, 2, 1, 5, False)


def test_null_sensitive_carries_no_flavor(spark):
    rows = [("en", 1, None), ("en", 2, None), ("en", 3, "a")]
    got = _run_l(spark, rows, l=2)
    # drop level: one class, 3 rows, only ONE distinct flavor
    assert got[2] == (0, 1, 1, 3, False)


def test_l_guards(spark):
    with pytest.raises(ValueError, match="l must"):
        profile.l_diversity_ladder(None, ["a"], "n", "s", l=1)


def test_l_random_vs_mirror_and_twin(spark):
    rng = random.Random(777)
    rows = [
        (rng.choice(["en", "de", "fr"]), rng.randrange(0, 400),
         rng.choice(["a", "b", "c", None]))
        for _ in range(300)
    ]
    got = _run_l(spark, rows, l=3)
    assert got == _mirror_l(rows, l=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(lang VARCHAR, n BIGINT, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(profile.l_diversity_ladder_sql(
        "t", ["lang"], "n", "src", l=3, dividers=DIVS
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got


# ---------------------------------------------------------------- t


def _run_t(spark, rows, t_ppm=250_000):
    df = spark.createDataFrame(rows, SCHEMA)
    out = profile.t_closeness_report(
        df, ["lang"], "src", t_ppm=t_ppm
    ).collect()
    return {r.lang: (r.n, r.tvd_ppm, r.t_close) for r in out}


def _mirror_t(rows, t_ppm=250_000):
    rows = [(la, s) for la, _, s in rows if s is not None]
    N = len(rows)
    glob: dict = {}
    for _, s in rows:
        glob[s] = glob.get(s, 0) + 1
    classes: dict = {}
    for la, s in rows:
        classes.setdefault(la, {})
        classes[la][s] = classes[la].get(s, 0) + 1
    out = {}
    for la, hist in classes.items():
        n = sum(hist.values())
        tvd = sum(
            abs(Fraction(hist.get(v, 0), n) - Fraction(g, N))
            for v, g in glob.items()
        ) / 2
        ppm = int(tvd * 1_000_000)  # floor of an exact Fraction
        out[la] = (n, ppm, ppm <= t_ppm)
    return out


def test_tvd_planted_skew(spark):
    # global: a=5, b=5 (uniform).  Class en: 4×a 1×b → TVD =
    # ½(|4/5−½| + |1/5−½|) = 3/10 → 300000 ppm.  Class de mirrors.
    rows = [("en", 0, "a")] * 4 + [("en", 0, "b")] \
        + [("de", 0, "b")] * 4 + [("de", 0, "a")]
    got = _run_t(spark, rows, t_ppm=250_000)
    assert got == {"en": (5, 300_000, False),
                   "de": (5, 300_000, False)}


def test_tvd_absent_value_tail(spark):
    # Class en never sees flavor c — the absent-tail term carries it:
    # global a=2,b=2,c=2; en: 2×a 1×b → TVD = ½(|2/3−1/3| + |1/3−1/3|
    # + |0−1/3|) = 1/3 → 333333 ppm (floored).
    rows = [("en", 0, "a"), ("en", 0, "a"), ("en", 0, "b"),
            ("de", 0, "b"), ("de", 0, "c"), ("de", 0, "c")]
    got = _run_t(spark, rows, t_ppm=340_000)
    assert got["en"] == (3, 333_333, True)


def test_t_guards(spark):
    with pytest.raises(ValueError, match="t_ppm"):
        profile.t_closeness_report(None, ["a"], "s", t_ppm=0)


def test_t_random_vs_mirror_and_twin(spark):
    rng = random.Random(888)
    rows = [
        (rng.choice(["en", "de", "fr", "es"]), 0,
         rng.choice(["a", "b", "c", "d", None]))
        for _ in range(400)
    ]
    got = _run_t(spark, rows, t_ppm=150_000)
    assert got == _mirror_t(rows, t_ppm=150_000)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(lang VARCHAR, n BIGINT, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    out = con.execute(profile.t_closeness_report_sql(
        "t", ["lang"], "src", t_ppm=150_000
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got

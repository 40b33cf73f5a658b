"""Fellegi–Sunter linkage scoring (dedup.fellegi_sunter) —
hand-pinned odds/patterns/verdicts, threshold boundary exactness,
weight validation, random ≡ Fraction mirror ≡ DuckDB twin."""

import random
from fractions import Fraction

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import dedup


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("fs-tests", master="local[4]",
                    shuffle_partitions=8)


FIELDS = [("f_lang", 950_000, 300_000),
          ("f_src", 900_000, 250_000),
          ("f_len", 800_000, 100_000)]
SCHEMA = "id_a long, id_b long, f_lang boolean, f_src boolean, " \
         "f_len boolean"


def _run(spark, rows, up, lo, fields=FIELDS):
    df = spark.createDataFrame(rows, SCHEMA)
    out = dedup.fellegi_sunter(df, fields, up, lo).collect()
    return {(r.id_a, r.id_b): (r.pattern, r.odds_ppm, r.verdict)
            for r in out}


def _mirror(rows, up, lo, fields=FIELDS):
    out = {}
    for row in rows:
        a, b = row[0], row[1]
        num = den = 1
        pat = 0
        for i, (agree, (_, m, u)) in enumerate(zip(row[2:], fields)):
            num *= m if agree else 10**6 - m
            den *= u if agree else 10**6 - u
            pat += (1 << i) if agree else 0
        odds = (num * 10**6) // den
        if Fraction(num * 10**6, den) >= up:
            v = "match"
        elif Fraction(num * 10**6, den) >= lo:
            v = "possible"
        else:
            v = "non_match"
        out[(a, b)] = (pat, odds, v)
    return out


def test_hand_pinned(spark):
    rows = [(1, 2, True, True, True),
            (1, 3, True, False, False),
            (1, 4, False, False, False)]
    got = _run(spark, rows, 10_000_000, 1_000_000)
    # all-agree: odds = (.95*.9*.8)/(.3*.25*.1) = 91.2
    assert got[(1, 2)] == (7, 91_200_000, "match")
    # lang only: (.95*.1*.2)/(.3*.75*.9) ≈ 0.0938
    assert got[(1, 3)][0] == 1
    assert got[(1, 3)][2] == "non_match"
    assert got[(1, 4)][0] == 0
    assert got == _mirror(rows, 10_000_000, 1_000_000)


def test_threshold_boundary_exact(spark):
    # single field: agree odds = 950000/300000 → odds_ppm floor =
    # 3166666; the CROSS-MULTIPLIED compare must treat the exact
    # rational (19/6 = 3.1666…) against the threshold, not the floor
    fields = [("f_lang", 950_000, 300_000)]
    rows = [(1, 2, True, None, None)]
    exact_num = 950_000 * 10**6
    exact_den = 300_000
    assert exact_num % exact_den != 0  # genuinely fractional
    floor_ppm = exact_num // exact_den
    got = _run(spark, rows, floor_ppm + 1, 0, fields=fields)
    # odds 3.1666e6 < floor+1 → not a match by the exact compare
    assert got[(1, 2)][2] == "possible"
    got2 = _run(spark, rows, floor_ppm, 0, fields=fields)
    assert got2[(1, 2)][2] == "match"


def test_validation(spark):
    df = spark.createDataFrame([(1, 2, True, True, True)], SCHEMA)
    with pytest.raises(ValueError, match="fields"):
        dedup.fellegi_sunter(df, [], 1, 0)
    with pytest.raises(ValueError, match="u < m"):
        dedup.fellegi_sunter(
            df, [("f_lang", 300_000, 300_000)], 1, 0
        )
    with pytest.raises(ValueError, match="u < m"):
        dedup.fellegi_sunter(df, [("f_lang", 995_000, 100_000)], 1, 0)
    with pytest.raises(ValueError, match="lower"):
        dedup.fellegi_sunter(df, FIELDS, 1, 2)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(31)
    rows = [
        (i, 1000 + i, rng.random() < 0.5, rng.random() < 0.5,
         rng.random() < 0.5)
        for i in range(200)
    ]
    up, lo = 5_000_000, 500_000
    got = _run(spark, rows, up, lo)
    assert got == _mirror(rows, up, lo)
    verdicts = {v for _, _, v in got.values()}
    assert verdicts == {"match", "possible", "non_match"}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p(id_a BIGINT, id_b BIGINT, f_lang BOOLEAN, "
        "f_src BOOLEAN, f_len BOOLEAN)"
    )
    con.executemany("INSERT INTO p VALUES (?, ?, ?, ?, ?)", rows)
    out = con.execute(
        dedup.fellegi_sunter_sql("p", FIELDS, up, lo)
    ).fetchall()
    assert {(r[0], r[1]): (r[2], r[3], r[4]) for r in out} == got

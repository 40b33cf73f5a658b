"""Stratified k-fold (sampling.kfold_assign) — exact per-stratum
balance, group atomicity (no leakage), determinism across calls,
validation, random ≡ DuckDB twin."""

import random
from collections import Counter

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import sampling


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("kfold-tests", master="local[4]",
                    shuffle_partitions=8)


SCHEMA = "rid long, lang string, grp string"


def _run(spark, rows, k=5):
    df = spark.createDataFrame(rows, SCHEMA)
    out = sampling.kfold_assign(df, "lang", "grp", k=k).collect()
    return {r.rid: (r.lang, r.grp, r.fold) for r in out}


def test_balance_and_atomicity(spark):
    rng = random.Random(5)
    rows = []
    rid = 0
    for lang in ("en", "de", "fr"):
        for g in range(17):   # 17 groups per stratum, k=5 → 4/3 split
            for _ in range(rng.randrange(1, 5)):
                rows.append((rid, lang, f"{lang}-g{g}"))
                rid += 1
    got = _run(spark, rows, k=5)
    # group atomicity: every group in exactly one fold
    by_group = {}
    for lang, grp, fold in got.values():
        by_group.setdefault(grp, set()).add(fold)
    assert all(len(f) == 1 for f in by_group.values())
    # exact balance per stratum: 17 groups → folds of size {4,3}
    for lang in ("en", "de", "fr"):
        sizes = Counter(
            next(iter(f)) for g, f in by_group.items()
            if g.startswith(lang)
        )
        assert sorted(sizes.values()) == [3, 3, 3, 4, 4]


def test_deterministic_across_calls(spark):
    rows = [(i, "en", f"g{i % 7}") for i in range(30)]
    assert _run(spark, rows, k=3) == _run(spark, rows, k=3)


def test_validation(spark):
    df = spark.createDataFrame([(1, "en", "g")], SCHEMA)
    with pytest.raises(ValueError, match="k must"):
        sampling.kfold_assign(df, "lang", "grp", k=1)


def test_random_vs_twin(spark):
    rng = random.Random(21)
    rows = [
        (i, rng.choice(["en", "de"]), f"grp{rng.randrange(25)}")
        for i in range(200)
    ]
    got = _run(spark, rows, k=4)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d(rid BIGINT, lang VARCHAR, grp VARCHAR)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", rows)
    out = con.execute(
        sampling.kfold_assign_sql("d", "lang", "grp", k=4)
    ).fetchall()
    assert {r[0]: (r[1], r[2], r[3]) for r in out} == got

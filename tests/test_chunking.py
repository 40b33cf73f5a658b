"""Pretraining document chunker (textops.chunk_documents)."""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("chunk-tests", master="local[4]",
                    shuffle_partitions=8)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_non_overlapping_windows_and_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))
    out = sorted(
        (r.chunk_id, r.n_tokens, r.chunk_text)
        for r in textops.chunk_documents(
            _docs(spark, [(1, text)]), chunk_tokens=4).collect()
    )
    assert [c[:2] for c in out] == [(0, 4), (1, 4), (2, 2)]
    assert out[0][2] == "t0 t1 t2 t3"
    assert out[2][2] == "t8 t9"  # tail kept, not padded/dropped


def test_sliding_overlap_reconstructs(spark):
    text = " ".join(f"w{i}" for i in range(12))
    out = {r.chunk_id: r.chunk_text for r in textops.chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=6, stride=3).collect()}
    # starts at 0,3,6: last window [6..11] reaches the end exactly —
    # no extra start needed
    assert set(out) == {0, 1, 2}
    assert out[1].split()[0] == "w3"
    # every token appears in at least one chunk
    seen = {t for c in out.values() for t in c.split()}
    assert seen == {f"w{i}" for i in range(12)}


def test_short_and_empty_docs(spark):
    out = textops.chunk_documents(
        _docs(spark, [(1, "only two"), (2, "   "), (3, "")]),
        chunk_tokens=128,
    ).collect()
    assert len(out) == 1 and out[0].n_tokens == 2


def test_duckdb_twin_matches(spark):
    import random
    rng = random.Random(3)
    rows = [(i, " ".join(f"x{rng.randrange(50)}"
                         for _ in range(rng.randrange(0, 300))))
            for i in range(80)]
    df = _docs(spark, rows)
    got = sorted(map(tuple, textops.chunk_documents(
        df, chunk_tokens=32, stride=24).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents3(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents3 VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(textops.chunk_documents_sql(
        "documents3", chunk_tokens=32, stride=24)).fetchall()))
    assert got == want


def test_zero_shuffle_plan(spark):
    plan = (
        textops.chunk_documents(_docs(spark, [(1, "a b")]), 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_args_validated(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        textops.chunk_documents(df, 0)
    with pytest.raises(ValueError):
        textops.chunk_documents(df, 4, stride=5)

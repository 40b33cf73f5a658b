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


def test_length_batches_reduce_padding(spark):
    """The point of length grouping: padding waste with length-sorted
    batches is far below random-order batching on skewed lengths."""
    import random
    rng = random.Random(2)
    rows = [(i, " ".join("x" for _ in range(rng.choice([5, 5, 5, 400]))))
            for i in range(400)]
    df = _docs(spark, rows)
    out = textops.length_batches(df, batch_size=16, n_groups=4).collect()
    total_waste = sum(r.pad_waste for r in out)
    # random-order expectation: most batches contain a 400-token doc →
    # waste ~ n_short·395 per mixed batch.  Sorted grouping keeps long
    # docs together: only the boundary batch of each group mixes.
    naive_waste = sum(
        max(len(t.split()) for _, t in rows[b:b + 16]) * len(rows[b:b + 16])
        - sum(len(t.split()) for _, t in rows[b:b + 16])
        for b in range(0, 400, 16)
    )
    assert total_waste < naive_waste / 4, (total_waste, naive_waste)
    # conservation: every doc in exactly one batch
    assert sum(r.n_items for r in out) == 400


def test_length_batches_duckdb_twin(spark):
    import random
    rng = random.Random(6)
    rows = [(i, " ".join("y" for _ in range(rng.randrange(0, 60))))
            for i in range(300)]
    df = _docs(spark, rows)
    got = sorted(map(tuple, textops.length_batches(
        df, batch_size=7, n_groups=5).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents4(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents4 VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(textops.length_batches_sql(
        "documents4", batch_size=7, n_groups=5)).fetchall()))
    assert got == want


def test_length_batches_no_global_window(spark):
    plan = (
        textops.length_batches(_docs(spark, [(1, "a b")]), 4, n_groups=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # window must be partitioned by grp — a global window would show
    # an empty partition spec
    assert "windowspecdefinition(grp" in plan.replace(" ", "") \
        or "windowspecdefinition(grp#" in plan, plan

"""Resource-allocation link prediction (graph.resource_allocation_pairs)
— planted hub-vs-rare-witness ranking, per-witness quantization, the
degree guard, mode symmetry, and DuckDB twin parity on random graphs."""

import random
from collections import defaultdict

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ra-tests", master="local[4]",
                    shuffle_partitions=8)


def _python(edges, mode="cocitation", min_count=1, scale=10**6):
    shared_of = (lambda s, d: (s, d)) if mode == "cocitation" else (
        lambda s, d: (d, s)
    )
    items = defaultdict(list)
    for s, d in edges:
        sh, it = shared_of(s, d)
        items[sh].append(it)
    out = defaultdict(lambda: [0, 0])
    for sh, its in items.items():
        w = scale // len(its)
        its_sorted = sorted(its)
        for i, a in enumerate(its_sorted):
            for b in its_sorted[i + 1:]:
                if a < b:
                    out[(a, b)][0] += 1
                    out[(a, b)][1] += w
    return {
        k: (v[0], v[1]) for k, v in out.items() if v[0] >= min_count
    }


def _spark(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = graph.resource_allocation_pairs(df, **kw).collect()
    return {
        (r["id_a"], r["id_b"]): (r["n_common"], r["ra_m"])
        for r in rows
    }


def test_rare_witness_beats_hub(spark):
    """Pages 1,2 share a rare citer (outdeg 2); pages 3,4 share a hub
    citer (outdeg 4): same n_common, RA ranks the rare-witness pair
    higher."""
    edges = [(100, 1), (100, 2),
             (200, 3), (200, 4), (200, 5), (200, 6)]
    got = _spark(spark, edges)
    assert got[(1, 2)] == (1, 500_000)
    assert got[(3, 4)] == (1, 250_000)
    assert got[(1, 2)][1] > got[(3, 4)][1]


def test_quantization_per_witness(spark):
    """Witness outdeg 3: each of its C(3,2) pairs gets 10⁶ DIV 3 =
    333333 — floored once per witness, summed exactly."""
    edges = [(7, 1), (7, 2), (7, 3), (8, 1), (8, 2)]
    got = _spark(spark, edges)
    assert got[(1, 2)] == (2, 333_333 + 500_000)
    assert got[(1, 3)] == (1, 333_333)


def test_coupling_mode(spark):
    """coupling weights shared REFERENCED pages by in-degree."""
    edges = [(1, 50), (2, 50), (3, 50)]
    got = _spark(spark, edges, mode="coupling")
    assert got == {(1, 2): (1, 333_333), (1, 3): (1, 333_333),
                   (2, 3): (1, 333_333)}


def test_degree_guard(spark):
    edges = [(9, i) for i in range(20)]
    with pytest.raises(Exception, match="max_degree"):
        _spark(spark, edges, max_degree=10)


def test_min_count_filter(spark):
    edges = [(7, 1), (7, 2), (8, 1), (8, 2), (9, 1), (9, 3)]
    got = _spark(spark, edges, min_count=2)
    assert set(got) == {(1, 2)}


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(321)
    edges = list({
        (rng.randrange(40), rng.randrange(40, 90))
        for _ in range(300)
    })
    for mode in ("cocitation", "coupling"):
        want = _python(edges, mode=mode)
        assert _spark(spark, edges, mode=mode) == want

        con = duckdb.connect()
        con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        got = {
            (r[0], r[1]): (r[2], r[3])
            for r in con.execute(
                graph.resource_allocation_sql("e", mode=mode)
            ).fetchall()
        }
        assert got == want
        con.close()

"""Deterministic negative sampling (graph.negative_edge_samples) —
probe-math parity with a pure-Python mirror, non-edge/self-loop
guarantees, probe-collision dedup, under-k exhaustion, validation,
and DuckDB twin parity (global-window rank vs two-level rank)."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph
from openstreetmap_license_change_spark.operators.dedup import (
    TOKEN_HASH_BASE,
    TOKEN_HASH_MOD,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("negsample-tests", master="local[4]",
                    shuffle_partitions=8)


def _hash(s):
    acc = 0
    for ch in s:
        acc = (acc * TOKEN_HASH_BASE + ord(ch)) % TOKEN_HASH_MOD
    return acc


def _py(nodes, edges, k=3, n_probes=12):
    nodes = sorted(set(nodes))
    ranked = sorted(nodes, key=lambda v: (_hash(str(v)), v))
    eset = set(edges)
    out = {}
    for src in sorted({s for s, _ in edges}):
        found = {}
        for i in range(1, n_probes + 1):
            pi = _hash(f"{src}#{i}") % len(ranked)
            cand = ranked[pi]
            if cand == src or (src, cand) in eset:
                continue
            if cand not in found:
                found[cand] = i
        picks = sorted(found.items(), key=lambda kv: kv[1])[:k]
        out[src] = [
            (dst, probe, rk + 1)
            for rk, (dst, probe) in enumerate(picks)
        ]
    return out


def _spark(spark, nodes, edges, k=3, n_probes=12):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = graph.negative_edge_samples(
        ndf, edf, k=k, n_probes=n_probes
    ).collect()
    out = {}
    for r in rows:
        out.setdefault(r["src"], []).append(
            (r["neg_dst"], r["probe"], r["rk"])
        )
    return {s: sorted(v, key=lambda x: x[2]) for s, v in out.items()}


def test_matches_python_mirror_and_properties(spark):
    rng = random.Random(17)
    nodes = list(range(40))
    edges = sorted(
        {
            (rng.randrange(40), rng.randrange(40))
            for _ in range(120)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    got = _spark(spark, nodes, edges)
    want = {s: v for s, v in _py(nodes, edges).items() if v}
    assert got == want
    eset = set(edges)
    for src, items in got.items():
        for dst, _, _ in items:
            assert dst != src and (src, dst) not in eset


def test_exhaustion_returns_fewer_than_k(spark):
    # 3 nodes, src 0 connected to everything → no negatives exist
    nodes = [0, 1, 2]
    edges = [(0, 1), (0, 2)]
    got = _spark(spark, nodes, edges, k=2, n_probes=6)
    assert 0 not in got or len(got[0]) == 0


def test_validation(spark):
    ndf = spark.createDataFrame([(1,)], "node bigint")
    edf = spark.createDataFrame([(1, 1)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="n_probes"):
        graph.negative_edge_samples(ndf, edf, k=5, n_probes=3)


def test_duckdb_twin_parity(spark):
    rng = random.Random(23)
    nodes = list(range(60))
    edges = sorted(
        {
            (rng.randrange(60), rng.randrange(60))
            for _ in range(200)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    want = _spark(spark, nodes, edges)

    con = duckdb.connect()
    con.execute("CREATE TABLE n (node BIGINT)")
    con.executemany("INSERT INTO n VALUES (?)", [(v,) for v in nodes])
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    rows = con.execute(
        graph.negative_edge_samples_sql("n", "e")
    ).fetchall()
    got = {}
    for s, d, p, r in rows:
        got.setdefault(s, []).append((d, p, r))
    got = {s: sorted(v, key=lambda x: x[2]) for s, v in got.items()}
    assert got == want

"""Dedup-cluster quality audit (dedup.cluster_audit) — planted tight
vs chained clusters, zero-overlap pairs included, singleton exclusion,
the size guard, and DuckDB twin parity."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import dedup


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("cluster-audit-tests", master="local[4]",
                    shuffle_partitions=8)


def _python(clusters, docs):
    toks = {i: set(t.lower().split()) - {""} for i, t in docs.items()}
    from collections import defaultdict

    members = defaultdict(list)
    for i, c in clusters.items():
        members[c].append(i)
    out = {}
    for c, ids in members.items():
        if len(ids) < 2:
            continue
        jacs = []
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = toks[ids[x]], toks[ids[y]]
                inter = len(a & b)
                union = max(len(a) + len(b) - inter, 1)
                jacs.append(inter * 10**6 // union)
        out[c] = (len(ids), len(jacs), min(jacs),
                  sum(jacs) // len(jacs))
    return out


def _spark(spark, clusters, docs, **kw):
    cdf = spark.createDataFrame(
        list(clusters.items()), "doc_id long, cluster_id long"
    )
    ddf = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    rows = dedup.cluster_audit(cdf, ddf, **kw).collect()
    return {
        r["cluster_id"]: (r["n_docs"], r["n_pairs"],
                          r["min_jaccard_ppm"], r["mean_jaccard_ppm"])
        for r in rows
    }


DOCS = {
    1: "alpha beta gamma delta",
    2: "alpha beta gamma delta",      # exact dup of 1
    3: "alpha beta gamma epsilon",    # near dup of 1
    4: "zeta eta theta",              # unrelated
    5: "totally different words here",
    6: "lone doc",
}
CLUSTERS = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_tight_vs_artifact_cluster(spark):
    """Cluster 1 is a genuine near-dup group (high floor); cluster 4
    chains two docs with ZERO overlap (floor 0 — the transitive-
    closure artifact the audit exists to expose)."""
    got = _spark(spark, CLUSTERS, DOCS)
    assert got == _python(CLUSTERS, DOCS)
    assert got[1][0] == 3 and got[1][1] == 3
    assert got[1][2] >= 600_000          # worst pair: 3/5
    assert got[4] == (2, 1, 0, 0)        # zero-overlap pair audited as 0
    assert 6 not in got                  # singleton excluded


def test_size_guard(spark):
    clusters = {i: 1 for i in range(10)}
    docs = {i: f"w{i}" for i in range(10)}
    with pytest.raises(Exception, match="max_cluster_size"):
        _spark(spark, clusters, docs, max_cluster_size=4)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(727)
    vocab = [f"t{i}" for i in range(25)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 15)))
        for i in range(60)
    }
    clusters = {i: rng.randrange(12) for i in range(60)}
    want = _python(clusters, docs)
    assert _spark(spark, clusters, docs) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE c (doc_id BIGINT, cluster_id BIGINT)")
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(clusters.items()))
    con.executemany("INSERT INTO d VALUES (?, ?)", list(docs.items()))
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            dedup.cluster_audit_sql("c", "d")
        ).fetchall()
    }
    assert got == want

"""Golden-record survivorship (dedup.golden_records) — longest-text
representative with smallest-id ties, modal category with
lexicographic ties, conflict-count audit columns, singleton clusters,
random ≡ Python mirror ≡ DuckDB twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import dedup


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("golden-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, docs, clusters):
    ddf = spark.createDataFrame(
        docs, "doc_id long, n_chars long, lang string"
    )
    cdf = spark.createDataFrame(clusters, "doc_id long, cluster_id long")
    out = dedup.golden_records(ddf, cdf).collect()
    return {
        r.cluster_id: (r.n_members, r.rep_doc_id, r.canonical_len,
                       r.canonical_cat, r.n_cats, r.total_chars)
        for r in out
    }


def _mirror(docs, clusters):
    d = {i: (l, g) for i, l, g in docs}
    byc = {}
    for i, c in clusters:
        byc.setdefault(c, []).append(i)
    out = {}
    for c, ids in byc.items():
        rep = min(ids, key=lambda i: (-d[i][0], i))
        cats = {}
        for i in ids:
            cats[d[i][1]] = cats.get(d[i][1], 0) + 1
        modal = min(cats, key=lambda g: (-cats[g], g))
        out[c] = (len(ids), rep, d[rep][0], modal, len(cats),
                  sum(d[i][0] for i in ids))
    return out


def test_longest_wins_smallest_id_ties(spark):
    docs = [(1, 50, "en"), (2, 80, "en"), (3, 80, "de")]
    clusters = [(1, 1), (2, 1), (3, 1)]
    got = _run(spark, docs, clusters)
    # 2 and 3 tie at 80 chars → smaller id 2 wins
    assert got[1][1] == 2 and got[1][2] == 80


def test_modal_category_lexicographic_tie(spark):
    docs = [(1, 10, "en"), (2, 10, "de"), (3, 10, "de"),
            (4, 10, "en")]
    clusters = [(i, 7) for i in (1, 2, 3, 4)]
    got = _run(spark, docs, clusters)
    # 2-2 tie between de/en → 'de' (lexicographically smallest)
    assert got[7][3] == "de" and got[7][4] == 2


def test_singleton_cluster(spark):
    docs = [(9, 33, "fr")]
    got = _run(spark, docs, [(9, 5)])
    assert got[5] == (1, 9, 33, "fr", 1, 33)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(1234)
    docs, clusters = [], []
    for i in range(200):
        docs.append((i, rng.randrange(1, 300),
                     rng.choice(["en", "de", "fr"])))
        clusters.append((i, rng.randrange(0, 40)))
    got = _run(spark, docs, clusters)
    assert got == _mirror(docs, clusters)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d(doc_id BIGINT, n_chars BIGINT, lang VARCHAR)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", docs)
    con.execute("CREATE TABLE c(doc_id BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO c VALUES (?, ?)", clusters)
    rows = con.execute(
        dedup.golden_records_sql("d", "c")
    ).fetchall()
    assert {r[0]: (r[1], r[2], r[3], r[4], r[5], r[6])
            for r in rows} == got

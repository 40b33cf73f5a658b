"""Attack tolerance (graph.attack_robustness) — a star shatters on
one removal, a cycle shrugs, baseline k=0, deterministic kill-list
tie-break, random ≡ union-find mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import graph


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ar-tests", master="local[4]",
                    shuffle_partitions=8)


def _run(spark, n, edges, ks):
    nd = spark.createDataFrame([(i,) for i in range(n)], "node long")
    eg = spark.createDataFrame(edges, "src long, dst long")
    out = graph.attack_robustness(nd, eg, ks).collect()
    return {r.k_removed: (r.n_remaining, r.n_components,
                          r.giant_size, r.giant_ppm) for r in out}


def _mirror(n, edges, ks):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg = {v: 0 for v in range(n)}
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    order = sorted(range(n), key=lambda v: (-deg[v], v))
    out = {}
    for k in sorted(set(ks)):
        dead = set(order[:k])
        alive = [v for v in range(n) if v not in dead]
        parent = {v: v for v in alive}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for a, b in und:
            if a not in dead and b not in dead:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        sizes = {}
        for v in alive:
            r = find(v)
            sizes[r] = sizes.get(r, 0) + 1
        nr = len(alive)
        giant = max(sizes.values()) if sizes else 0
        out[k] = (nr, len(sizes), giant,
                  None if nr == 0 else (giant * 10**6) // nr)
    return out


def test_star_shatters_cycle_shrugs(spark):
    star = [(0, i) for i in range(1, 7)]
    got = _run(spark, 7, star, [0, 1])
    assert got[0] == (7, 1, 7, 1_000_000)
    assert got[1] == (6, 6, 1, 166_666)    # hub gone → dust
    cyc = [(i, (i + 1) % 7) for i in range(7)]
    gc = _run(spark, 7, cyc, [0, 1])
    assert gc[1] == (6, 1, 6, 1_000_000)   # a cycle only bends


def test_kill_list_tiebreak_smallest_id(spark):
    # two degree-2 hubs (1 and 3); k=1 must remove node 1
    edges = [(1, 0), (1, 2), (3, 4), (3, 5)]
    got = _run(spark, 6, edges, [1])
    # removing 1 leaves {0},{2},{3,4,5}
    assert got[1] == (5, 3, 3, 600_000)
    assert got == _mirror(6, edges, [1])


def test_validation(spark):
    with pytest.raises(ValueError, match="k_list"):
        _run(spark, 2, [(0, 1)], [])
    with pytest.raises(ValueError, match=">= 0"):
        _run(spark, 2, [(0, 1)], [-2])


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(343434)
    n = 40
    edges = list({(rng.randrange(n), rng.randrange(n))
                  for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    ks = [0, 2, 6]
    got = _run(spark, n, edges, ks)
    assert got == _mirror(n, edges, ks)
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(n)])
    con.executemany("INSERT INTO eg VALUES (?, ?)", edges)
    out = con.execute(
        graph.attack_robustness_sql("nd", "eg", ks)
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == got


def _kmv(v):
    h = (v % 2**31) * 2654435761 % 2**32
    return (h ^ (h >> 16)) % 2**32


def test_hash_failure_vs_targeted_attack(spark):
    # a star: targeted k=1 kills the hub; hash-ordered "random"
    # failure almost surely removes a leaf and the giant survives
    star = [(0, i) for i in range(1, 9)]
    hash_first = min(range(9), key=lambda v: (_kmv(v), v))
    tgt = _run(spark, 9, star, [1])
    nd = spark.createDataFrame([(i,) for i in range(9)], "node long")
    eg = spark.createDataFrame(star, "src long, dst long")
    rnd = {
        r.k_removed: (r.n_remaining, r.n_components, r.giant_size,
                      r.giant_ppm)
        for r in graph.attack_robustness(
            nd, eg, [1], strategy="hash"
        ).collect()
    }
    assert tgt[1][2] == 1                  # attack shatters
    if hash_first != 0:
        assert rnd[1][2] == 7              # failure only nicks it
    con = duckdb.connect()
    con.execute("CREATE TABLE nd(node BIGINT)")
    con.execute("CREATE TABLE eg(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?)",
                    [(i,) for i in range(9)])
    con.executemany("INSERT INTO eg VALUES (?, ?)", star)
    out = con.execute(graph.attack_robustness_sql(
        "nd", "eg", [1], strategy="hash"
    )).fetchall()
    assert {r[0]: tuple(r[1:]) for r in out} == rnd


def test_strategy_validation(spark):
    with pytest.raises(ValueError, match="strategy"):
        graph.attack_robustness(
            spark.createDataFrame([(0,)], "node long"),
            spark.createDataFrame([(0, 0)], "src long, dst long"),
            [1], strategy="bogus",
        )

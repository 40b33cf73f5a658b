"""ε-neighborhood clustering (operators/spatial.py eps_neighbor_edges /
eps_clusters).

Claims: the 3×3 neighbor-cell probe finds exactly the ε-ball pairs
(incl. cross-cell and antimeridian), each once; res < eps raises
(silent recall loss is not an option); components label by min id with
pointer jumping giving O(log diameter) convergence — a 64-point chain
converges inside the default iteration budget where plain edge-hop
propagation would need 64 rounds; exhaustion warns."""

import random

import pytest
from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("eps-cluster-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


def _df(spark, rows):
    return spark.createDataFrame(rows, "pid string, lon double, lat double")


def _brute_edges(rows, eps):
    out = set()
    for i, (a, alon, alat) in enumerate(rows):
        for b, blon, blat in rows[i + 1:]:
            dl = abs(alon - blon)
            dl = min(dl, 360 - dl)
            if dl * dl + (alat - blat) ** 2 <= eps * eps:
                out.add((min(a, b), max(a, b)))
    return out


def _brute_components(rows, eps):
    edges = _brute_edges(rows, eps)
    parent = {r[0]: r[0] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {r[0]: find(r[0]) for r in rows}


def test_edges_match_bruteforce_randomized(spark):
    rng = random.Random(7)
    rows = [
        (f"p{i:03d}", rng.uniform(-179.9, 179.9), rng.uniform(-89.9, 89.9))
        for i in range(120)
    ] + [
        # a dense pocket to guarantee edges
        (f"q{i:02d}", 10.0 + rng.uniform(0, 0.5), 20.0 + rng.uniform(0, 0.5))
        for i in range(40)
    ]
    for eps, res in ((0.3, 0.3), (0.3, 1.0), (5.0, 5.0)):
        got = {
            (r.id_a, r.id_b)
            for r in spatial.eps_neighbor_edges(
                _df(spark, rows), eps, id_col="pid", res_deg=res
            ).collect()
        }
        assert got == _brute_edges(rows, eps), (eps, res)


def test_cross_cell_and_antimeridian_pairs_found(spark):
    rows = [
        # straddling a 0.25° cell edge, 0.002 apart
        ("a1", 9.999, 50.0), ("a2", 10.001, 50.0),
        # antimeridian: 0.004 apart across ±180
        ("b1", 179.998, 0.0), ("b2", -179.998, 0.0),
        # near but NOT within eps
        ("c1", 30.0, 30.0), ("c2", 30.5, 30.0),
    ]
    got = {
        (r.id_a, r.id_b)
        for r in spatial.eps_neighbor_edges(
            _df(spark, rows), 0.01, id_col="pid", res_deg=0.25
        ).collect()
    }
    assert got == {("a1", "a2"), ("b1", "b2")}


def test_res_below_eps_raises(spark):
    with pytest.raises(ValueError, match="res_deg"):
        spatial.eps_neighbor_edges(
            _df(spark, [("x", 0.0, 0.0)]), eps_deg=1.0, id_col="pid",
            res_deg=0.5,
        )


def test_chain_converges_via_pointer_jumping(spark):
    """64 points in a line, each 0.008 from the next (ε=0.01): ONE
    component of diameter 63 edges.  Plain min-propagation needs ~63
    rounds; with pointer jumping the default max_iters=12 suffices —
    and no non-convergence warning fires."""
    import warnings

    rows = [(f"n{i:02d}", 10.0 + 0.008 * i, 0.0) for i in range(64)]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        labels = {
            r.pid: r.cluster_id
            for r in spatial.eps_clusters(
                _df(spark, rows), 0.01, id_col="pid", res_deg=0.25
            ).collect()
        }
    assert set(labels) == {r[0] for r in rows}
    assert set(labels.values()) == {"n00"}


def test_clusters_match_bruteforce_components(spark):
    rng = random.Random(41)
    rows = []
    for c in range(6):  # 6 pockets + background noise
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        rows += [
            (f"c{c}_{i}", cx + rng.uniform(0, 0.02), cy + rng.uniform(0, 0.02))
            for i in range(8)
        ]
    rows += [(f"iso{i}", rng.uniform(-170, 170), rng.uniform(-80, 80))
             for i in range(20)]
    got = {
        r.pid: r.cluster_id
        for r in spatial.eps_clusters(
            _df(spark, rows), 0.05, id_col="pid", res_deg=0.25
        ).collect()
    }
    assert got == _brute_components(rows, 0.05)


def test_nonconvergence_warns(spark):
    rows = [(f"n{i}", 10.0 + 0.008 * i, 0.0) for i in range(16)]
    with pytest.warns(RuntimeWarning, match="did NOT converge"):
        spatial.eps_clusters(
            _df(spark, rows), 0.01, id_col="pid", res_deg=0.25,
            max_iters=1,
        ).collect()

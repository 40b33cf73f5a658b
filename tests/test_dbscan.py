"""Full DBSCAN (operators/spatial.py dbscan): core/border/noise roles
and cluster ids vs a brute-force reference (deterministic min-label
border assignment in both), incl. planted border points — the sf
corpora produce only core/noise, so the border branch lives here."""

import random

import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("dbscan-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _df(spark, rows):
    return spark.createDataFrame(rows, "pid string, lon double, lat double")


def _brute(rows, eps, min_pts):
    def d2(a, b):
        dl = abs(a[1] - b[1])
        dl = min(dl, 360 - dl)
        return dl * dl + (a[2] - b[2]) ** 2

    nbrs = {
        a[0]: [b[0] for b in rows if b[0] != a[0] and d2(a, b) <= eps * eps]
        for a in rows
    }
    core = {p for p, ns in nbrs.items() if len(ns) + 1 >= min_pts}
    parent = {p: p for p in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in core:
        for q in nbrs[p]:
            if q in core:
                ra, rb = find(p), find(q)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    label = {p: find(p) for p in core}
    # min over the component requires a second normalization pass
    comp_min = {}
    for p, r in label.items():
        comp_min[r] = min(comp_min.get(r, p), p)
    label = {p: comp_min[r] for p, r in label.items()}
    out = {}
    for p, _, _ in rows:
        if p in core:
            out[p] = ("core", label[p])
        else:
            core_nb = sorted(label[q] for q in nbrs[p] if q in core)
            out[p] = ("border", core_nb[0]) if core_nb else ("noise", None)
    return out


def test_planted_roles(spark):
    rows = [
        # a 4-point blob: all within eps of each other -> core at min_pts=3
        ("a1", 10.000, 0.0), ("a2", 10.002, 0.0),
        ("a3", 10.000, 0.002), ("a4", 10.002, 0.002),
        # border: within eps of a4 ONLY (ball size 2 < min_pts)
        ("b1", 10.011, 0.006),
        # noise pair: mutually close but neither core, no core neighbor
        ("x1", 50.0, 50.0), ("x2", 50.002, 50.0),
        # isolated noise
        ("z1", -120.0, 30.0),
    ]
    got = {
        r.pid: (r.role, r.cluster_id)
        for r in spatial.dbscan(
            _df(spark, rows), eps_deg=0.01, min_pts=3, id_col="pid",
            res_deg=0.25,
        ).collect()
    }
    assert got == _brute(rows, 0.01, 3)
    assert got["b1"] == ("border", "a1")
    assert got["x1"] == ("noise", None) and got["z1"] == ("noise", None)
    assert {got[f"a{i}"] for i in (1, 2, 3, 4)} == {("core", "a1")}


@pytest.mark.parametrize("min_pts", [1, 3, 6])
def test_randomized_vs_bruteforce(spark, min_pts):
    rng = random.Random(17)
    rows = []
    for c in range(5):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        rows += [
            (f"c{c}_{i}", cx + rng.uniform(0, 0.03), cy + rng.uniform(0, 0.03))
            for i in range(rng.randint(2, 9))
        ]
    rows += [(f"iso{i}", rng.uniform(-170, 170), rng.uniform(-80, 80))
             for i in range(15)]
    got = {
        r.pid: (r.role, r.cluster_id)
        for r in spatial.dbscan(
            _df(spark, rows), eps_deg=0.02, min_pts=min_pts, id_col="pid",
            res_deg=0.25,
        ).collect()
    }
    assert got == _brute(rows, 0.02, min_pts)


def test_min_pts_one_everything_core(spark):
    rows = [("p1", 0.0, 0.0), ("p2", 100.0, 0.0)]
    got = {
        r.pid: (r.role, r.cluster_id)
        for r in spatial.dbscan(
            _df(spark, rows), eps_deg=0.01, min_pts=1, id_col="pid"
        ).collect()
    }
    assert got == {"p1": ("core", "p1"), "p2": ("core", "p2")}


def test_min_pts_zero_raises(spark):
    with pytest.raises(ValueError, match="min_pts"):
        spatial.dbscan(_df(spark, [("p", 0.0, 0.0)]), 0.01, 0, id_col="pid")
